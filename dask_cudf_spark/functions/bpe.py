"""Trained-vocab byte-pair encoding (SURVEY.md §2.8, nvtext
`byte_pair_encoding` parity — upstream: cpp/src/text/bpe/*,
python/cudf/cudf/core/byte_pair_encoding.py).

Parity note: cudf's nvtext BPE *encodes with a pretrained merge-pair
table* (``BytePairEncoder(merge_pairs)`` loaded from a merges file);
training is out of scope there too.  This module therefore ships

- :func:`train_bpe` — the classic Sennrich word-frequency BPE trainer
  (pure Python; a tokenizer is a bounded driver-side artifact exactly
  like the IVF codebook in operators/similarity.py), and
- :data:`CORPUS_MERGES` — a merge table trained with it on the
  sf0.001 `documents` vocabulary (the shipped artifact, provenance
  test in tests/test_text_bpe.py), and
- :func:`bpe_encode_expr` / :func:`bpe_encode_sql` — twin encoders.

Encoding is expressed as a NESTED REPLACE CHAIN over a DOUBLE-space-
separated symbol representation (" h  e  l  l  o " -> apply
" a  b " -> " ab " per merge in rank order).  Symbols are separated by
TWO spaces so that adjacent matches never share a boundary character:
each match consumes one of the two boundary spaces on either side and
the single-space replacement restores the two-space invariant, making
one non-overlapping left-to-right ``replace`` pass per merge exactly
BPE's greedy in-order merge application — including CONSECUTIVE
occurrences ("banana" with merge (a,n) -> [b, an, an, a]), which a
single-space representation misses because the trailing space of one
match is the leading space of the next.  The Spark plan and the DuckDB
oracle are the same expression and stay bit-identical.  Everything is
JVM-side (no Python boundary): at 100 TB the encode runs inside the
scan stage.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def train_bpe(
    word_counts: Mapping[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency dict (Sennrich 2016):
    repeatedly merge the most frequent adjacent symbol pair.
    Deterministic: ties break lexicographically on the pair.

    The word-frequency dict is the output of a corpus-wide token count
    (one Spark shuffle, see q_vocab_topk) — bounded by vocabulary size,
    not corpus size, so collecting it is the same "trained artifact"
    move as collecting an IVF codebook."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


# Shipped artifact: train_bpe(word_counts(sf0.001 documents), 40).
# tests/test_text_bpe.py re-derives it from the corpus; regenerate this
# literal there if the driver ever regenerates the documents table.
CORPUS_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"), ("l", "ine"),
    ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"), ("g", "e"),
    ("mer", "ge"), ("er", "y"),
]


def bpe_segment(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder (test twin of the column
    expression): double-space-separate the chars, apply each merge in
    rank order as a left-to-right non-overlapping replace.  The
    two-space separator keeps adjacent matches from sharing a boundary
    space (see module docstring), so one pass per merge suffices."""
    s = " " + "  ".join(word) + " "
    for a, b in merges:
        s = s.replace(f" {a}  {b} ", f" {a}{b} ")
    return s.split() if word else []


def bpe_encode_expr(
    col: Column | str, merges: Sequence[tuple[str, str]] | None = None
) -> Column:
    """Subword-encode every whitespace token of ``col`` with the merge
    table; returns ONE string with all subword tokens space-separated
    (word boundaries dissolve into token boundaries, like nvtext's
    flat token output).  Pure Column expression — no UDF."""
    merges = CORPUS_MERGES if merges is None else merges

    def encode_word(word: Column) -> Column:
        spaced = F.concat(
            F.lit(" "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length(word)),
                    lambda i: F.substring(word, i, F.lit(1)),
                ),
                "  ",
            ),
            F.lit(" "),
        )
        folded = reduce(
            lambda acc, m: F.replace(
                acc, F.lit(f" {m[0]}  {m[1]} "), F.lit(f" {m[0]}{m[1]} ")
            ),
            merges,
            spaced,
        )
        # interior boundaries are exactly two spaces -> collapse to one.
        # The empty WORD ('' document — r10 empty leg) is pinned to ''
        # explicitly on both sides: unguarded, Spark's sequence(1, 0)
        # descends into phantom chars while DuckDB's
        # array_to_string([], ..) goes NULL and poisons the whole doc.
        return F.when(
            F.length(word) > 0,
            F.replace(F.trim(folded), F.lit("  "), F.lit(" ")),
        ).otherwise(F.lit(""))

    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.transform(F.split(c, " "), encode_word), " ")


def bpe_encode_sql(
    expr: str, merges: Sequence[tuple[str, str]] | None = None
) -> str:
    """DuckDB twin of :func:`bpe_encode_expr`: the same nested replace
    chain emitted as SQL text (merge table inlined as literals)."""
    merges = CORPUS_MERGES if merges is None else merges
    spaced = (
        "(' ' || array_to_string(list_transform(range(len(w)), "
        "i -> substr(w, i + 1, 1)), '  ') || ' ')"
    )
    folded = spaced
    for a, b in merges:
        folded = f"replace({folded}, ' {a}  {b} ', ' {a}{b} ')"
    # CASE pin, matching bpe_encode_expr: '' word -> '' (DuckDB's
    # array_to_string over the empty char list is NULL, which would
    # otherwise poison the whole document — r10 empty-string leg).
    # trim(x, ' '): explicit space-only char set — DuckDB's bare trim()
    # strips UNICODE whitespace, so a word made of NBSP/U+3000 chars
    # trimmed to NOTHING here while Spark's ASCII trim kept it
    # (r11 corpus fuzz via q_tokenizer_fertility; same pin as the
    # exact-dedup fingerprint oracle)
    return (
        f"array_to_string(list_transform(string_split({expr}, ' '), "
        f"w -> CASE WHEN len(w) > 0 "
        f"THEN replace(trim({folded}, ' '), '  ', ' ') ELSE '' END), ' ')"
    )


__all__ = [
    "CORPUS_MERGES",
    "bpe_encode_expr",
    "bpe_encode_sql",
    "bpe_segment",
    "train_bpe",
]
