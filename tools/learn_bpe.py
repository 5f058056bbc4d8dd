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

CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = "osm_cycling_quality_index_spark/functions/bpe_merges.py"


def simulate_column_count(word: str, merges: list[tuple[str, str]],
                          repeat: int) -> int:
    """Token count of ``word`` under the engine's replace-chain semantics:
    each rule applied as a non-overlapping literal replace, ``repeat``
    times (str.replace == Spark F.replace == DuckDB replace)."""
    s = " " + " ".join(word) + " "
    for a, b in merges:
        for _ in range(repeat):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


def greedy_count(word: str, merges: list[tuple[str, str]]) -> int:
    """Reference greedy encoder (lowest-rank adjacent pair first),
    identical to functions/bpe.py bpe_encode_word."""
    rank = {p: i for i, p in enumerate(merges)}
    sym = list(word)
    while len(sym) > 1:
        best_rank = min((rank[p] for p in zip(sym, sym[1:]) if p in rank),
                        default=None)
        if best_rank is None:
            break
        a, b = merges[best_rank]
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def validate_merges(merges: list[tuple[str, str]], words) -> None:
    """Learner-time gate: raise ValueError if the table could make the
    engine's replace chain diverge from the greedy encoder.

    (a) Structural: same-symbol rules ``(x, x)`` are rejected outright —
    their pair sites overlap, and non-overlapping left-to-right replace can
    strand symbols unrecoverably on runs >= 4 (``aaaaaa`` -> 4 tokens vs
    greedy 3) at ANY repeat count.  Distinct-symbol rules have disjoint
    sites and two passes are always exhaustive (functions/bpe.py module
    doc).  (b) Empirical: replace-chain simulation at the engine's _REPEAT
    must equal the greedy count for every training-corpus word."""
    try:
        from osm_cycling_quality_index_spark.functions.bpe import _REPEAT
    except ValueError:
        # the COMMITTED merges table tripped bpe.py's import-time guard —
        # exactly the situation this tool exists to fix; fall back to the
        # engine default so the stale artifact can be replaced
        _REPEAT = 3

    same = [p for p in merges if p[0] == p[1]]
    if same:
        raise ValueError(
            f"same-symbol merges are not chain-safe (under-merge on runs "
            f">= 4): {same!r}")
    bad = [w for w in words
           if simulate_column_count(w, merges, _REPEAT)
           != greedy_count(w, merges)]
    if bad:
        raise ValueError(
            f"replace-chain under-merge at _REPEAT={_REPEAT} for "
            f"{len(bad)} corpus words, e.g. {bad[:3]!r}")


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows = duckdb.connect().execute(f"SELECT text FROM '{CORPUS}'").fetchall()
    words = Counter()
    for (t,) in rows:
        words.update(t.lower().split())
    vocab = {tuple(w): c for w, c in words.items()}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
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
        # same-symbol pairs (x, x) are also skipped: not chain-safe under
        # non-overlapping replace (see validate_merges)
        usable = {p: c for p, c in pairs.items()
                  if not set(p[0] + p[1]) & banned and p[0] != p[1]}
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

    validate_merges(merges, words.keys())
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
