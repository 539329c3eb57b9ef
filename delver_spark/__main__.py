"""CLI entry point: run a crawl application from a JSON config.

Mirrors the reference's program surface (main.go:43-49 — ``delver
<config.json>``): ``python -m delver_spark <config.json>`` loads the
application document, assembles the engine (delver_spark/config.py),
runs it to completion, and prints a one-line JSON summary of the run
(rounds, fetched, enqueued, deduped) built from the lineage artifact.
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print("Config path must be provided", file=sys.stderr)  # main.go:45
        return 2
    from .config import build_engine
    from .session import get_spark

    spark = get_spark("delver_spark_app")
    eng = build_engine(spark, argv[0])
    eng.run()
    lin = eng.lineage_df()
    empty = len(lin) == 0  # zero-round run → column-less frame
    summary = {
        "mode": eng.mode,
        "rounds": 0 if empty else int(lin["round"].max()) + 1,
        "fetched": 0 if empty else int(lin["fetched"].sum()),
        "deduped": 0 if empty else int(lin["deduped"].sum()),
        "enqueued": 0 if empty else int(lin["enqueued"].sum()),
        "workdir": eng.workdir,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
