"""The committed dist/whoiswho_spark.zip must match the source tree.

A stale zip makes the documented ``spark-submit --py-files`` commands run
OLD code (round-3 advice: the checked-in zip predated the event-time
retention signature and the entrypoint crashed with a TypeError). This is
the CI check: member set and byte content must equal what
``tools/package.py`` would build from HEAD. Fix a failure by re-running
``python tools/package.py``.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "whoiswho_spark.zip")


def _source_members() -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, "whoiswho_spark")):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith((".py", ".json")):
                p = os.path.join(root, fn)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, REPO)] = f.read()
    return out


def test_dist_zip_matches_source_tree():
    assert os.path.exists(ZIP), (
        "dist/whoiswho_spark.zip missing — run `python tools/package.py`"
    )
    src = _source_members()
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        assert names == set(src), (
            "zip is stale — run `python tools/package.py` "
            f"(missing={sorted(set(src) - names)[:5]}, "
            f"extra={sorted(names - set(src))[:5]})"
        )
        for name, body in src.items():
            assert z.read(name) == body, (
                f"zip member {name} differs from source — run "
                "`python tools/package.py`"
            )
