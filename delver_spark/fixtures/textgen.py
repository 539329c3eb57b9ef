"""Shared hazard planting for the synthetic TEXT corpora.

examples/text_pipeline.py (driver-side list, small n) and
bench_text_pipeline.py (sharded vectorized parquet writer, large n)
generate their word salad differently on purpose — but the HAZARD MIX
(boilerplate rate, PII rate, degenerate repetition, exact-dup stride)
must stay identical or the demo demonstrates a different pipeline than
the bench measures (r5 review finding). One rule table, two callers.
"""

BOILER = ("this website uses cookies to improve your experience please "
          "accept our terms and conditions before you continue reading")

VOCAB = ("the quick brown fox jumps over lazy dog rain spain plain stays "
         "mainly word salad corpus training data pipeline spark shuffle "
         "partition filter sample window aggregate stream batch quality "
         "signal noise model token sequence context budget shard").split()

PII_TAIL = " contact sales@example.test or 555-123-4567 today"

DUP_STRIDE = 20  # docs i, i+1 are exact duplicates for i % DUP_STRIDE == 0


def plant_hazards(i: int, text: str) -> str:
    """Apply the deterministic per-doc hazard rules to doc ``i``."""
    if i % 10 == 3:                       # boilerplate in 10%
        text = text + " " + BOILER
    if i % 25 == 7:                       # PII in 4%
        text += PII_TAIL
    if i % 40 == 11:                      # degenerate repetition
        text = "buy now " * 40
    return text
