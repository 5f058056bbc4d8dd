"""Learn the committed BPE merges table from the sf0.001 documents corpus.

Classic byte-pair-encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm): start
from characters, repeatedly merge the most frequent adjacent symbol pair
across the word-frequency dictionary.  Ties are broken by lexicographic
pair order so the table is fully deterministic.  Merges never cross word
boundaries (no end-of-word symbol: the engine keeps words separated by an
explicit boundary marker instead, see functions/bpe.py).

Writes osm_cycling_quality_index_spark/functions/bpe_merges.py; the table
is committed so runtime never depends on this script.

Usage: python tools/learn_bpe.py [n_merges]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = "osm_cycling_quality_index_spark/functions/bpe_merges.py"


def main() -> None:
    rows = duckdb.connect().execute(f"SELECT text FROM '{CORPUS}'").fetchall()
    words = Counter()
    for (t,) in rows:
        words.update(t.lower().split())
    vocab = {tuple(w): c for w, c in words.items()}

    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # symbols containing quotes, pipes, backslashes or whitespace are
        # unusable downstream: quotes/backslashes break the single-quoted
        # SQL interpolation in bpe_query_sql, '|' collides with the
        # encoder's word-boundary mark (bpe.py asserts the same invariant
        # on the committed table)
        banned = set("'\"|\\ \t\n")
        usable = {p: c for p, c in pairs.items()
                  if not set(p[0] + p[1]) & banned}
        if not usable:
            break
        (a, b), _ = min(usable.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab

    with open(OUT, "w") as fh:
        fh.write(
            '"""BPE merges table learned from the sf0.001 documents corpus by\n'
            "tools/learn_bpe.py (deterministic: frequency then lexicographic\n"
            'tie-break).  Regenerate with `python tools/learn_bpe.py`."""\n\n'
            f"#: (first_symbol, second_symbol) in merge-rank order\nMERGES = {merges!r}\n"
        )
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
