"""Generate the x68 golden literal oracle: run the INDEPENDENT pure-Python
BPE fit (the same reference implementation tests/test_bpe.py pins the
Spark fit against) over the sf0.01 documents table and print the literal
VALUES rows for the oracle SQL. Regenerate with:

    python tools/gen_bpe_oracle.py > /tmp/bpe_oracle.txt

and paste into queries/extensions9.py's _X68_ROWS if the testdata or the
merge count ever changes."""

from __future__ import annotations

import os
import sys

import duckdb

# the SINGLE reference implementation lives in tests/test_bpe.py (kept
# deliberately independent of operators/bpe.py); import it rather than
# keeping a third copy that could drift
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)  # test_bpe imports the engine package
sys.path.insert(0, os.path.join(_ROOT, "tests"))
from test_bpe import _fit_reference as fit_reference  # noqa: E402

N_MERGES = 12


def main() -> None:
    rows = duckdb.sql(
        "SELECT word, COUNT(*) AS c FROM ("
        "SELECT UNNEST(string_split(text, ' ')) AS word "
        "FROM '/root/testdata/sf0.01/documents.parquet') "
        "WHERE word <> '' GROUP BY word"
    ).fetchall()
    merges = fit_reference({w: c for w, c in rows}, N_MERGES)
    print(
        ", ".join(
            f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(merges)
        )
    )


if __name__ == "__main__":
    main()
