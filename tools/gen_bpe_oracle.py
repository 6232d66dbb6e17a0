"""Generate the x68 golden literal oracle: run the INDEPENDENT pure-Python
BPE fit (the same reference implementation tests/test_bpe.py pins the
Spark fit against) over the sf0.01 documents table and print the literal
VALUES rows for the oracle SQL. Regenerate with:

    python tools/gen_bpe_oracle.py > /tmp/bpe_oracle.txt

and paste into queries/extensions9.py's _X68_ROWS if the testdata or the
merge count ever changes."""

from __future__ import annotations

from collections import Counter

import duckdb

N_MERGES = 12


def fit_reference(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


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
