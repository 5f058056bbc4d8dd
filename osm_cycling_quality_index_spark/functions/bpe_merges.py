"""BPE merges table learned from the sf0.001 documents corpus by
tools/learn_bpe.py (deterministic: frequency then lexicographic
tie-break).  Regenerate with `python tools/learn_bpe.py`."""

#: (first_symbol, second_symbol) in merge-rank order
MERGES = [('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'), ('s', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('m', 'er'), ('a', 't'), ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('d', 'ow'), ('in', 'dow'), ('w', 'indow'), ('d', 'er'), ('or', 'der'), ('or', 't'), ('s', 'ort'), ('par', 't'), ('u', 'p'), ('a', 'g'), ('ag', 'g'), ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('in', 'e'), ('l', 'ine'), ('e', 'y'), ('k', 'ey'), ('j', 'o'), ('jo', 'in'), ('g', 'e'), ('mer', 'ge'), ('er', 'y'), ('g', 'r'), ('gr', 'o'), ('gro', 'up'), ('q', 'u'), ('qu', 'ery'), ('c', 't'), ('ct', 'or'), ('e', 'ctor'), ('v', 'ector'), ('a', 's'), ('as', 'h'), ('h', 'ash'), ('l', 'ow'), ('s', 'low'), ('a', 'm'), ('e', 'am'), ('r', 'eam'), ('st', 'ream'), ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er'), ('a', 'st'), ('f', 'ast')]
