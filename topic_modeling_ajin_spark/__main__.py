"""CLI entry point — parity with the reference's argparse surface
(``LDA_Analysis.py:731-776``: ``--topics/-t``, ``--data/-d``,
``--column/-c``) re-shaped for the engine:

    python -m topic_modeling_ajin_spark --sf-dir /root/testdata/sf0.01 \
        --out /tmp/results [--mode full|words] [--topics 5]
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(prog="topic_modeling_ajin_spark")
    p.add_argument(
        "--sf-dir",
        "-d",
        default="/root/testdata/sf0.01",
        help="dataset directory (parquet tables)",
    )
    p.add_argument("--out", "-o", required=True, help="output directory")
    p.add_argument(
        "--mode",
        "-m",
        choices=("full", "words"),
        default="full",
        help="full = both topic branches + metrics; words = word-frequency only",
    )
    p.add_argument(
        "--topics",
        "-t",
        type=int,
        default=None,
        help="override LDA topic count (2-50, like the reference's prompt)",
    )
    args = p.parse_args()
    if args.topics is not None and not 2 <= args.topics <= 50:
        p.error("--topics must be in 2..50")  # LDA_Analysis.py:827-842

    from .pipeline import run_full_analysis, run_word_frequency
    from .session import get_spark

    spark = get_spark("cli")
    if args.topics is not None:
        from .operators import topics as T

        # module-level K override, same effect as the reference's CLI arg
        T.LDA_K = args.topics
    run = run_full_analysis if args.mode == "full" else run_word_frequency
    written = run(spark, args.sf_dir, args.out)
    for name, path in written.items():
        print(f"{name}\t{path}")


if __name__ == "__main__":
    main()
