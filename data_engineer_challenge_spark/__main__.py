"""CLI entry point — the engine's equivalent of the reference's
``python script.py`` daemon (Dockerfile:18; script.py:60-131).

    python -m data_engineer_challenge_spark \
        --registry fichiers/export_patient.xlsx \
        --documents fichiers/ \
        --warehouse ./warehouse \
        [--interval 30] [--max-batches N] [--changed-only]

Each cycle mirrors the reference's triggers: registry mtime change →
patient pipeline; any document dir change → document pipeline; first
batch force-loads both.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(prog="data_engineer_challenge_spark")
    ap.add_argument("--registry", required=True, help="patient xlsx path")
    ap.add_argument("--documents", required=True, help="clinical documents dir")
    ap.add_argument("--warehouse", required=True, help="warehouse output dir")
    ap.add_argument("--sheet", default=None, help="xlsx sheet name")
    ap.add_argument("--interval", type=float, default=30.0, help="poll seconds")
    ap.add_argument(
        "--max-batches", type=int, default=None, help="stop after N cycles (default: run forever)"
    )
    ap.add_argument(
        "--changed-only",
        action="store_true",
        help="re-extract only changed files instead of full reprocess",
    )
    args = ap.parse_args()

    from .session import get_spark
    from .streaming.daemon import CdwDaemon

    spark = get_spark(app_name="cdw-daemon")
    daemon = CdwDaemon(
        spark,
        warehouse_root=args.warehouse,
        registry_path=args.registry,
        documents_dir=args.documents,
        sheet_name=args.sheet,
        changed_only=args.changed_only,
    )
    daemon.run(max_batches=args.max_batches, interval_s=args.interval)


if __name__ == "__main__":
    main()
