"""Run any queries() pipeline from the command line.

    python scripts/run_query.py <query> [--sf-dir DIR] [--out PATH]
    python scripts/run_query.py --list

Writes the result as one Parquet file when --out is given, else prints
the first rows. The query names are the SURVEY §2 / §2.11 operator
inventory (same registry the round driver checks)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="queries() key (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="write result parquet here instead of printing")
    ap.add_argument("--list", action="store_true", dest="list_names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    if args.list_names or not args.query:
        print("\n".join(qs))
        ray.shutdown()
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r} — try --list")
    result = qs[args.query](args.sf_dir)
    tbl = result if hasattr(result, "num_rows") else None
    if tbl is None:                      # pandas fallback
        import pyarrow as pa
        tbl = pa.Table.from_pandas(result, preserve_index=False)
    if args.out:
        import pyarrow.parquet as pq
        pq.write_table(tbl, args.out)
        print(f"{args.query}: {tbl.num_rows} rows -> {args.out}")
    else:
        print(tbl.slice(0, 20).to_pandas())
        print(f"[{tbl.num_rows} rows]")
    ray.shutdown()


if __name__ == "__main__":
    main()
