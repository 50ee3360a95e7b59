"""Shared decoder hardening for untrusted web bytes.

The corpus columns these codecs read are adversarial by definition
(crawled payloads). The Spark stages treat ValueError as "skip this
row"; any OTHER exception escaping a decoder (zlib.error, struct.error,
IndexError, KeyError, OverflowError — all observed under byte fuzzing)
would kill the whole task and, with it, the stage. ``corrupt_input_
guard`` normalizes every parse-time failure to ValueError with the
original type preserved in the message and the chain.

``check_dimensions`` bounds header-declared pixel counts BEFORE any
plane allocation — a corrupt header claiming 65535×65535 must not
become a multi-GB executor allocation (the decompressed data would
never back it, but the zero-fill lands first).
"""

from __future__ import annotations

import functools

#: per-image pixel ceiling for header-declared dimensions (64 MPix —
#: far above any corpus image, far below an executor-killing zero-fill)
MAX_PIXELS = 64_000_000


def corrupt_input_guard(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except MemoryError:
            raise
        except Exception as e:
            raise ValueError(
                f"{fn.__name__}: malformed input "
                f"({type(e).__name__}: {e})"
            ) from e

    return wrapped


def check_dimensions(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"{what}: implausible dimensions {w}x{h}")
