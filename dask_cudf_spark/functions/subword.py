"""Subword tokenization with a hash vocabulary (nvtext subword_tokenize
stand-in, upstream cpp/src/text/subword/ — the real thing loads a
trained WordPiece vocab; here the vocab is a fixed literal list so the
segmentation is fully deterministic and oracle-checkable).

Scheme: per word, greedy LONGEST-PREFIX match against VOCAB (ties break
lexicographically); unmatched positions fall back to the single
character — exactly WordPiece's greedy pass minus the '##' continuation
marker.  Each piece maps to a stable id: first 60 bits of md5, mod
VOCAB_HASH_BUCKETS (the "hash vocab" — no trained id table needed, and
md5 has a bit-identical twin in DuckDB).

The SQL twin (``subword_oracle_sql``) replays the same greedy loop as a
recursive CTE and the same ids via
``CAST('0x' || substr(md5(piece), 1, 15) AS BIGINT) % buckets``.
"""

from __future__ import annotations

VOCAB: list[str] = [
    # multi-char pieces tuned to nothing in particular — the point is
    # deterministic segmentation, not linguistic quality
    "tab", "le", "win", "dow", "cust", "omer", "val", "ue", "vec", "tor",
    "str", "eam", "sp", "ark", "fil", "ter", "or", "der", "sc", "an",
    "jo", "in", "me", "rge", "ba", "tch", "gr", "oup", "qu", "ery",
    "co", "lumn", "sl", "ow", "sm", "all", "ha", "sh", "da", "ta",
    "li", "ne", "ro", "ke", "pa", "rt", "so", "ag", "bi", "du",
    "fa", "st", "th", "e",
]

VOCAB_HASH_BUCKETS = 30000

def build_subword_tokenizer():
    """Factory returning self-contained (pieces, piece_id) closures.

    Like porter.build_porter_stem: no module-scope function references,
    so cloudpickle ships them BY VALUE and Spark workers need not be
    able to import this package (driver launched from arbitrary cwd)."""
    vocab_ordered = sorted(VOCAB, key=lambda v: (-len(v), v))
    buckets = VOCAB_HASH_BUCKETS

    def pieces(word):
        out = []
        i = 0
        n = len(word)
        while i < n:
            best = None
            for v in vocab_ordered:
                if word.startswith(v, i):
                    best = v
                    break
            if best is None:
                best = word[i]
            out.append(best)
            i += len(best)
        return out

    def piece_id(piece):
        import hashlib

        return int(hashlib.md5(piece.encode()).hexdigest()[:15], 16) % buckets

    return pieces, piece_id


#: module-level instances for driver-side use (tests, oracle parity);
#: factory products still pickle by value when captured in UDF closures
subword_pieces, piece_id = build_subword_tokenizer()


def subword_oracle_sql(words_cte: str) -> str:
    """DuckDB twin of subword_pieces + piece_id.

    `words_cte` must produce (doc_id, w); the returned query yields
    (doc_id, n_pieces, n_distinct_pieces, id_sum) — order-insensitive
    per-doc fingerprints of the segmentation."""
    vocab_list = ", ".join(f"'{v}'" for v in VOCAB)
    return f"""
        WITH RECURSIVE
        vocab(piece) AS (SELECT unnest([{vocab_list}])),
        words AS ({words_cte}),
        seg AS (
            SELECT doc_id, w AS rest, CAST([] AS VARCHAR[]) AS pieces
            FROM words
            UNION ALL
            SELECT doc_id, substr(rest, len(p) + 1),
                   list_append(pieces, p)
            FROM (
                SELECT doc_id, rest, pieces,
                    coalesce(
                        (SELECT v.piece FROM vocab v
                         WHERE starts_with(rest, v.piece)
                         ORDER BY len(v.piece) DESC, v.piece LIMIT 1),
                        substr(rest, 1, 1)) AS p
                FROM seg WHERE rest <> ''
            )
        ),
        done AS (
            SELECT doc_id, unnest(pieces) AS piece
            FROM seg WHERE rest = ''
        ),
        ids AS (
            SELECT doc_id, piece,
                   CAST(('0x' || substr(md5(piece), 1, 15)) AS BIGINT)
                       % {VOCAB_HASH_BUCKETS} AS pid
            FROM done
        )
        -- LEFT JOIN from the doc list: a doc whose every word segments
        -- to zero pieces (empty text — r10 empty-string leg) must
        -- still report (0, 0, 0), exactly like the engine's per-doc
        -- stats row; aggregating `ids` alone silently DROPS such docs
        SELECT w.doc_id,
               COUNT(i.piece) AS n_pieces,
               COUNT(DISTINCT i.piece) AS n_distinct_pieces,
               CAST(COALESCE(SUM(i.pid), 0) AS BIGINT) AS id_sum
        FROM (SELECT DISTINCT doc_id FROM words) w
        LEFT JOIN ids i USING (doc_id)
        GROUP BY w.doc_id
    """
