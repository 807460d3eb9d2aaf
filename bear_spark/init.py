"""Bootstrap entry point — stand up a working table in one command.

The reference's ``init`` walks an interactive checklist: configure,
start backend, create/wipe the database from the model spec, test-crawl,
ingest (reference: bear/init.py:109-133). The engine's equivalent is
non-interactive (flags instead of prompts — this tool must run under
spark-submit and CI):

    python -m bear_spark.init --root /data/transcripts --wipe \
        --demo-events 20000

creates (or wipes and recreates) the transcript lake table from the
declared schema, and with ``--demo-events`` runs the full pipeline once:
synthetic changelog → streaming CDC apply → lineage summary, so a fresh
checkout proves itself end-to-end in one shot.
"""

from __future__ import annotations

import argparse
import json
import os

from bear_spark.config import Settings, get_spark_from_settings


def bootstrap(
    spark,
    root: str,
    settings: Settings | None = None,
    wipe: bool = False,
    demo_events: int = 0,
):
    """Create the transcript table (DDL from the declared schema —
    reference analog: db_init(wipe=...), bear/init.py:115-117); with
    ``demo_events`` also run changelog → apply and return the applier
    metrics."""
    from bear_spark.events import change_events
    from bear_spark.lake import LakeTable
    from bear_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
    from bear_spark.sources.changelog import write_changelog
    from bear_spark.streaming import CDCApplier

    s = settings or Settings.load()
    table = LakeTable.create(
        spark,
        os.path.join(root, "table"),
        TRANSCRIPT_SCHEMA,
        key_cols=KEY_COLS,
        num_buckets=s.num_buckets,
        lateness_sec=s.lateness_sec,
        drop_late=s.drop_late,
        overwrite=wipe,
    )
    metrics: list[dict] = []
    if demo_events:
        ev = change_events(spark, demo_events, seed=7)
        write_changelog(ev, os.path.join(root, "changelog"), n_chunks=8)
        app = CDCApplier(
            spark,
            table,
            os.path.join(root, "changelog"),
            os.path.join(root, "checkpoint"),
            os.path.join(root, "metrics"),
            max_files_per_trigger=s.max_files_per_trigger,
            compact_every=s.compact_every,
            metrics_flush_every=s.metrics_flush_every,
            merge_mode=s.merge_mode,
            merge_precombine={"1": True, "0": False}.get(s.merge_precombine),
            target_file_rows=s.target_file_rows,
        )
        metrics = app.run_available()
    return table, metrics


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="table root directory")
    p.add_argument("--wipe", action="store_true", help="drop and recreate")
    p.add_argument("--demo-events", type=int, default=0,
                   help="run a demo ingest of N synthetic change events")
    p.add_argument("--env-file", default=".env")
    args = p.parse_args(argv)

    s = Settings.load(env_file=args.env_file)
    spark = get_spark_from_settings(s, app_name="bear_spark_init")
    table, metrics = bootstrap(
        spark, args.root, settings=s, wipe=args.wipe, demo_events=args.demo_events
    )
    summary = {
        "root": args.root,
        "version": table.snapshot["version"],
        "rows": table.read().count(),
        "batches": len(metrics),
        "rows_in": sum(m.get("rows_in", 0) for m in metrics),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
