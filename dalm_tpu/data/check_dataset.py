"""Print a saved dataset's schema and rows — debugging helper.

Twin of `/root/reference/dalm/datasets/qa_gen/check_dataset.py` (a
hardcoded-path script there); here it takes the path as an argument.

Usage: ``python -m dalm_tpu.data.check_dataset <dataset_dir_or_csv> [limit]``
"""

from __future__ import annotations

import sys


def main(path: str, limit: int | None = None) -> None:
    from dalm_tpu.data.loading import load_dataset

    dataset = load_dataset(path)
    print(dataset)
    for idx, row in enumerate(dataset):
        if limit is not None and idx >= limit:
            print(f"... ({len(dataset) - limit} more rows)")
            break
        print(f"Row {idx}: {row}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: python -m dalm_tpu.data.check_dataset <path> [limit]")
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else None)
