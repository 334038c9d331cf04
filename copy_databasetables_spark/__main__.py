"""CLI for the copy engine — the reference's invocation surface
(SURVEY.md §3.1: a script called with source/target + a table list and
copy options), re-expressed over Spark:

    python -m copy_databasetables_spark \
        --source /root/testdata/sf0.001 --target /tmp/copy_out \
        --tables region nation customer --partitions 4 --checksum

Copies run in FK order regardless of the order given, each verified by
row count (and optionally an order-insensitive content checksum); the
exit code is non-zero if any copy fails verification.
"""

from __future__ import annotations

import argparse
import sys
import time

from copy_databasetables_spark.copy.engine import CopyVerificationError, copy_tables
from copy_databasetables_spark.io import TABLES
from copy_databasetables_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="copy_databasetables_spark",
        description="Copy tables between storage locations, verified.",
    )
    ap.add_argument("--source", required=True, help="source directory (parquet tables)")
    ap.add_argument("--target", required=True, help="target root directory")
    ap.add_argument(
        "--tables",
        nargs="+",
        default=None,
        metavar="TABLE",
        help=f"tables to copy (default: all of {' '.join(TABLES[:7])})",
    )
    ap.add_argument(
        "--partitions",
        type=int,
        default=None,
        help="write parallelism per table (the bulk-copy batch knob)",
    )
    ap.add_argument(
        "--checksum",
        action="store_true",
        help="verify an order-insensitive content checksum, not just counts",
    )
    args = ap.parse_args(argv)

    spark = get_spark("copy-cli")
    t0 = time.time()
    try:
        results = copy_tables(
            spark,
            args.source,
            args.target,
            tables=args.tables,
            num_partitions=args.partitions,
            verify_checksum=args.checksum,
        )
    except CopyVerificationError as err:
        print(f"FAILED: {err}", file=sys.stderr)
        return 1
    except KeyError as err:
        print(f"FAILED: {err}", file=sys.stderr)
        return 2
    except Exception as err:  # unreadable source, permissions, ...
        first_line = str(err).split("\n")[0]
        print(f"FAILED: {type(err).__name__}: {first_line}", file=sys.stderr)
        return 3
    for r in results:
        print(f"copied {r.table:<10} {r.rows_copied:>9} rows -> {r.target_path}")
    print(f"done: {len(results)} tables in {time.time() - t0:.1f}s (verified)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
