"""Deterministic synthetic web-page corpus (FIXTURES.md §1-4).

The web analog of WhoIsWho's benchmark data: each true entity gets 1-8
near-duplicate page variants sharing a host (the way same-author papers
share coauthor/org/venue tokens — /root/reference/whoiswho/dataset/
data_process.py:104-212), with hosts drawn Zipf-style so head-domain skew
is real.

Generation is fully distributed and fully deterministic: ``spark.range``
over entity ids → ``mapInPandas`` deriving every page from
``RandomState(seed ^ entity_id)``. No driver-side materialization — the
same code generates 5e3 pages for tests or 1e12 at cluster scale; no
collect, no Python state shared across partitions.

Output columns:
    pages:      url, warc_ts, html BINARY, text, lang
    labels:     url, entity_id
    embeddings: url, embedding ARRAY<FLOAT> (dim 64, entity centroid + noise)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from whoiswho_spark.functions.normalize import ref_extract_text

SEED = 42
EMB_DIM = 64
_VOCAB_SIZE = 5000
_BOILERPLATE = [
    "subscribe to our newsletter today",
    "all rights reserved worldwide",
    "click here for more articles",
    "privacy policy and terms of service",
]

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "entity_id bigint, embedding array<float>"
)


def _vocab() -> list[str]:
    rs = np.random.RandomState(SEED)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(_VOCAB_SIZE):
        n = rs.randint(4, 11)
        out.append("".join(rs.choice(letters, n)))
    return out


def _gen_entity_pages(eid: int, n_hosts: int, vocab: list[str]) -> list[dict]:
    rs = np.random.RandomState((SEED * 1_000_003 + eid) % (2**31 - 1))
    # Zipf-ish host choice: inverse-CDF of rank^-1.2 over n_hosts ranks.
    u = rs.rand()
    host_rank = int(n_hosts * (u ** (1 / (1.2 - 0.2)))) % n_hosts
    host = f"site{host_rank}.example.com"

    n_title = rs.randint(6, 13)
    title_words = [vocab[i] for i in rs.randint(0, _VOCAB_SIZE, n_title)]
    n_paras = rs.randint(2, 6)
    paras = [
        " ".join(vocab[i] for i in rs.randint(0, _VOCAB_SIZE, rs.randint(20, 41)))
        for _ in range(n_paras)
    ]
    centroid = rs.randn(EMB_DIM)
    centroid /= np.linalg.norm(centroid)

    n_variants = 1 + rs.randint(0, 8)
    rows = []
    for v in range(n_variants):
        vr = np.random.RandomState((SEED * 7_000_003 + eid * 31 + v) % (2**31 - 1))
        tw = list(title_words)
        # token drop (≤1) + synonym-ish swap (≤1) + case noise
        if v > 0 and len(tw) > 6 and vr.rand() < 0.5:
            tw.pop(vr.randint(0, len(tw)))
        if v > 0 and vr.rand() < 0.4:
            k = vr.randint(0, len(tw))
            tw[k] = vocab[vr.randint(0, _VOCAB_SIZE)]
        if vr.rand() < 0.3:
            k = vr.randint(0, len(tw))
            tw[k] = tw[k].upper()
        title = " ".join(tw)

        vparas = list(paras)
        if v > 0 and vr.rand() < 0.5:
            vparas.append(_BOILERPLATE[vr.randint(0, len(_BOILERPLATE))])
        if v > 0 and len(vparas) > 2 and vr.rand() < 0.3:
            vparas.pop(vr.randint(0, len(vparas)))
        body = "".join(f"<p>{p}.</p>" for p in vparas)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body>{body}</body></html>"
        ).encode("utf-8")

        emb = centroid + 0.05 * vr.randn(EMB_DIM)
        emb = (emb / np.linalg.norm(emb)).astype(np.float32)

        lang_u = vr.rand()
        lang = "en" if lang_u < 0.9 else ["de", "fr", "zh"][int(lang_u * 1000) % 3]
        rows.append(
            {
                "url": f"https://{host}/e{eid}/v{v}",
                "warc_ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=int(vr.randint(0, 30_000_000))),
                "html": html,
                "text": ref_extract_text(html),
                "lang": lang,
                "entity_id": eid,
                "embedding": emb,
            }
        )
    return rows


def generate_pages(
    spark: SparkSession, n_entities: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: one task batch per entity range."""
    n_hosts = max(4, n_entities // 50)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        vocab = _vocab()
        for pdf in batches:
            out = []
            for eid in pdf["id"]:
                out.extend(_gen_entity_pages(int(eid), n_hosts, vocab))
            yield pd.DataFrame(out)

    return (
        spark.range(0, n_entities, numPartitions=parts)
        .mapInPandas(gen, schema=PAGE_SCHEMA)
    )


def write_fixture(spark: SparkSession, n_entities: int, path: str) -> None:
    """Materialize pages/labels/embeddings parquet under ``path``."""
    df = generate_pages(spark, n_entities)
    df.write.mode("overwrite").parquet(f"{path}/corpus.parquet")
    full = spark.read.parquet(f"{path}/corpus.parquet")
    full.select("url", "warc_ts", "html", "text", "lang").write.mode(
        "overwrite"
    ).parquet(f"{path}/pages.parquet")
    full.select("url", "entity_id").write.mode("overwrite").parquet(
        f"{path}/labels.parquet"
    )
    full.select("url", "embedding").write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet"
    )
