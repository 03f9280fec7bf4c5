"""Adversarial corpus generator for the registry corpus-fuzz leg
(round 11; extends the injection-replay program of scripts/null_replay.py).

The five injection legs mutate CELLS of the real testdata; this
generator replaces the text/embedding DISTRIBUTIONS wholesale: every
seed derives a fresh ``documents`` + ``embeddings`` parquet pair whose
contents are deliberately hostile — unicode across planes (CJK, emoji,
combining marks), regex metacharacters, quotes/backslashes/control
bytes, whitespace pathologies, sub-shingle-length and 5,000-char
repeated-run texts, empty and NULL cells, PLANTED duplicate/near-dup
clusters (so dedup/minhash/jaccard queries see real match structure,
not just noise), skewed source distributions, zero/duplicate/constant
embedding vectors.  Both engines then read the SAME parquet, so any
query-vs-oracle mismatch is an engine-semantics divergence (no SQL
literal escaping is ever involved).

Determinism: everything derives from numpy's PCG64 seeded with the
plan seed, so any failure replays bit-for-bit from its seed number.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# the real testdata vocabulary (TESTDATA.md documents table) — kept so
# stopword / lang-id / vocab-growth queries fire on realistic tokens
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()

#: stopwords several registered queries filter on (q_token_filter)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]

CJK = list("一二三四五中文语言模型数据流处理引擎分布式")
EMOJI = list("😀🔥🚀🌍💡🤖🎉🧪📦🔑")
COMBINING = ["é", "à", "ö", "ñ"]  # é à ö ñ (decomposed)
GREEK_CYR = list("αβγδεζабвгде")
METACHARS = list(".*+?()[]{}|^$\\/'\"`%_")
CONTROL = ["\t", "\n", "\r", "\x0b", "\x0c"]
#: non-ASCII spaces: NBSP + ideographic space — NOT matched by \s in
#: either engine's regex (Java and RE2 both default \s to ASCII), so a
#: "blank-looking" doc that tokenizes as ONE token
ODD_SPACE = [" ", "　"]

LANGS = ["en", "fr", "es", "zh", "de"]


def _word_salad(rng: np.random.Generator, lo: int = 1, hi: int = 120) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _unicode_soup(rng: np.random.Generator) -> str:
    pools = [CJK, EMOJI, COMBINING, GREEK_CYR, VOCAB, METACHARS, ODD_SPACE]
    n = int(rng.integers(3, 60))
    parts = []
    for _ in range(n):
        pool = pools[int(rng.integers(0, len(pools)))]
        parts.append(str(rng.choice(pool)))
        if rng.random() < 0.5:
            parts.append(" ")
    return "".join(parts)


def _hostile_punct(rng: np.random.Generator) -> str:
    # quotes, backslash sequences (incl. the literal \N Kafka sentinel),
    # SQL-comment lookalikes, embedded control chars between real words
    frags = [
        "it's", 'say "hi"', "\\N", "back\\slash", "-- not a comment",
        "100% off", "a_b", "x%y", "' OR '1'='1", "{json: maybe}",
    ]
    n = int(rng.integers(2, 8))
    parts = []
    for _ in range(n):
        parts.append(str(rng.choice(frags + VOCAB)))
        parts.append(str(rng.choice(CONTROL)) if rng.random() < 0.3 else " ")
    return "".join(parts).strip()


def _degenerate(rng: np.random.Generator) -> str | None:
    kind = int(rng.integers(0, 8))
    if kind == 0:
        return None
    if kind == 1:
        return ""
    if kind == 2:  # whitespace-only (ASCII): tokenizes to zero tokens
        return "".join(rng.choice(CONTROL + [" "]) for _ in range(int(rng.integers(1, 6))))
    if kind == 3:  # odd-space only: looks blank, is ONE token
        return str(rng.choice(ODD_SPACE)) * int(rng.integers(1, 4))
    if kind == 4:  # shorter than every shingle width in use (2..6)
        return str(rng.choice(list("axz一😀")))
    if kind == 5:  # long repeated run: every char-shingle identical
        return str(rng.choice(list("ab一"))) * int(rng.integers(1000, 5000))
    if kind == 6:  # one giant token (no whitespace at all)
        return "".join(rng.choice(list("abcdefgh"))
                       for _ in range(int(rng.integers(200, 800))))
    # multi-space runs + leading/trailing whitespace
    return "  " + "   ".join(rng.choice(VOCAB) for _ in range(5)) + " \t"


def _mutate(rng: np.random.Generator, text: str) -> str:
    """Small edit for near-dup planting: delete/insert/substitute one
    char, or swap two adjacent words."""
    if not text:
        return text + "x"
    op = int(rng.integers(0, 4))
    i = int(rng.integers(0, len(text)))
    if op == 0:
        return text[:i] + text[i + 1:]
    if op == 1:
        return text[:i] + str(rng.choice(VOCAB))[0] + text[i:]
    if op == 2:
        return text[:i] + "z" + text[i + 1:]
    words = text.split(" ")
    if len(words) >= 2:
        j = int(rng.integers(0, len(words) - 1))
        words[j], words[j + 1] = words[j + 1], words[j]
        return " ".join(words)
    return text + " z"


def gen_documents(seed: int) -> pa.Table:
    """One deterministic hostile documents table per seed."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 260))
    # skewed sources: a couple dominate (dup_rate_by_source structure)
    n_src = int(rng.integers(2, 8))
    src_weights = rng.dirichlet(np.ones(n_src) * 0.6)
    texts: list[str | None] = []
    for _ in range(n):
        r = rng.random()
        if r < 0.10 and texts:  # exact-dup cluster member
            texts.append(texts[int(rng.integers(0, len(texts)))])
        elif r < 0.22 and texts:  # near-dup: 1-3 small edits
            base = texts[int(rng.integers(0, len(texts)))]
            t = base if base is not None else _word_salad(rng)
            for _ in range(int(rng.integers(1, 4))):
                t = _mutate(rng, t)
            texts.append(t)
        elif r < 0.40:
            texts.append(_degenerate(rng))
        elif r < 0.55:
            texts.append(_unicode_soup(rng))
        elif r < 0.68:
            texts.append(_hostile_punct(rng))
        else:
            texts.append(_word_salad(rng))
    langs = [
        None if rng.random() < 0.05
        else "" if rng.random() < 0.05
        else str(rng.choice(LANGS))
        for _ in range(n)
    ]
    sources = [
        None if rng.random() < 0.05
        else f"src{int(rng.choice(n_src, p=src_weights))}"
        for _ in range(n)
    ]
    n_chars = [None if t is None else len(t) for t in texts]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
    )


def gen_embeddings(seed: int, dim: int = 64, ragged: bool = False) -> pa.Table:
    """One deterministic hostile embeddings table per seed: normal
    vectors plus zero vectors (cosine-denominator probe), exact
    duplicates (top-k tie probe), constant vectors, tiny-magnitude
    vectors, NULL embeddings/labels.  ``ragged=True`` additionally
    emits empty and wrong-length vectors (a second-phase probe —
    queries may pin an explicit contract for those)."""
    rng = np.random.default_rng(seed ^ 0x5EED)
    # floor 180: the stride-sampled codebooks need enough seed
    # candidates (kmeans stride 19 x 8 clusters needs ids through 133;
    # PQ stride 13 x 8 codes through 91) to survive the ~10% null/zero
    # exclusions — "need N seeds, found M" is the operators' documented
    # misconfiguration contract, not a robustness finding.  Tiny/empty
    # corpora are covered by tests/test_empty_inputs.py.
    n = int(rng.integers(180, 400))
    vecs: list[list[float] | None] = []
    for _ in range(n):
        r = rng.random()
        if r < 0.04:
            vecs.append(None)
        elif r < 0.10:
            vecs.append([0.0] * dim)  # zero vector: ||v|| = 0
        elif r < 0.16 and any(v is not None for v in vecs):
            cands = [v for v in vecs if v is not None]
            vecs.append(list(cands[int(rng.integers(0, len(cands)))]))
        elif r < 0.20:
            vecs.append([float(np.float32(rng.normal() * 1e-20))] * dim)
        elif ragged and r < 0.24:
            vecs.append([])  # empty vector
        elif ragged and r < 0.27:
            vecs.append([1.0] * int(rng.integers(1, dim)))  # short vector
        elif ragged and r < 0.30:
            v = [float(np.float32(x)) for x in rng.normal(size=dim)]
            v[int(rng.integers(0, dim))] = float(
                rng.choice([np.nan, np.inf, -np.inf])
            )
            vecs.append(v)  # non-finite element
        else:
            vecs.append(
                [float(np.float32(x)) for x in rng.normal(size=dim)]
            )
    labels = [
        None if rng.random() < 0.05 else int(rng.integers(0, 10))
        for _ in range(n)
    ]
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# Events / JSON corpus (r11 second axis): hostile event streams whose
# props column probes the JSON-parsing divergence space — malformed
# payloads, duplicate keys, unicode escapes, extreme numbers, deep
# nesting, root-level scalars — while event_id/ts keep the declared
# ingest contracts (unique ids, non-null event time).
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _json_hostile(rng: np.random.Generator) -> str | None:
    kind = int(rng.integers(0, 14))
    k = int(rng.integers(0, 100))
    if kind == 0:
        return None
    if kind == 1:
        return ""
    if kind == 2:  # plain valid (the common case)
        return f'{{"k": {k}}}'
    if kind == 3:  # extra fields, unicode key + value, escapes
        return (
            f'{{"k": {k}, "devïce": "iøs\\u00e9", "emoji": "😀", '
            f'"q": "say \\"hi\\""}}'
        )
    if kind == 4:  # k as a JSON string, not a number
        return f'{{"k": "{k}"}}'
    if kind == 5:  # wide array payload beside k
        arr = ", ".join(str(int(rng.integers(0, 9))) for _ in range(40))
        return f'{{"k": {k}, "arr": [{arr}]}}'
    if kind == 6:  # nested: k at the top, payload deep
        inner = '{"x": 1}'
        for _ in range(int(rng.integers(3, 20))):
            inner = f'{{"n": {inner}}}'
        return f'{{"k": {k}, "deep": {inner}}}'
    if kind == 7:  # extreme numbers
        n = rng.choice(["9223372036854775807", "18446744073709551616",
                        "1e308", "-0.0", "0.30000000000000004", "1E+2"])
        return f'{{"k": {k}, "big": {n}}}'
    if kind == 8:  # malformed: truncated mid-object
        return f'{{"k": {k}, "dev'
    if kind == 9:  # malformed where BOTH engines agree on rejection.
        # Deliberately absent: trailing commas (DuckDB/yyjson accepts,
        # Spark/Jackson rejects), single-quoted strings (Spark accepts,
        # DuckDB rejects), duplicate keys (Spark's OWN get_json_object
        # takes the first, from_json the last) — those acceptance-
        # profile divergences are definitional engine semantics, pinned
        # as fixed expectations in tests/test_json_leniency.py, not
        # differential-fuzzed (no oracle can follow Jackson's profile).
        return str(rng.choice([
            '{k: 1}', '{', 'not json at all', '[1, 2,', 'NaN', 'Infinity',
            '{"k": 05}',
        ]))
    if kind == 10:  # root-level scalar / array (valid JSON, no object)
        return str(rng.choice([f"{k}", "true", "null", '"just a string"',
                               f'[{k}, {k + 1}]']))
    if kind == 11:  # k absent entirely
        return '{"other": "field"}'
    if kind == 12:  # k null
        return '{"k": null}'
    # whitespace-padded valid JSON (leading/trailing)
    return f'  {{"k": {k}}}  '


def gen_events(seed: int) -> pa.Table:
    """One deterministic hostile events table per seed.  Contracts
    kept: event_id unique, ts non-null (order-key ingest contract,
    NULLS.md) with heavy ties and bursts; value stays in a sane
    magnitude range (extreme-magnitude float sums are a DIFFERENT
    leg — they break every engine's scaled-int discipline equally)."""
    rng = np.random.default_rng(seed ^ 0xE7E27)
    n = int(rng.integers(300, 1500))
    n_users = int(rng.integers(3, 30))
    base = 1_700_000_000_000_000  # 2023-11 in us
    ts, t = [], base
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            pass  # exact tie with the previous event
        elif r < 0.3:
            t += int(rng.integers(1, 1000))  # sub-ms burst
        else:
            t += int(rng.integers(1_000_000, 3_600_000_000))
        ts.append(t)
    types = [
        None if rng.random() < 0.04
        else "" if rng.random() < 0.04
        else str(rng.choice(EVENT_TYPES + ["类型", "tüp", "a b"]))
        for _ in range(n)
    ]
    values = [
        None if rng.random() < 0.05
        else float(np.float64(rng.choice(
            [0.0, 0.01, -5.5, 185.22, 1e-8, 99999.99]
        )) * (1 + rng.random()))
        for _ in range(n)
    ]
    props = [_json_hostile(rng) for _ in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                [int(rng.integers(0, n_users)) for _ in range(n)],
                type=pa.int64(),
            ),
            "event_type": pa.array(types, type=pa.string()),
            "value": pa.array(values, type=pa.float64()),
            "props": pa.array(props, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Relational corpus (r12 third axis, r11 VERDICT item 5): hostile
# lineitem/orders/customer distributions for the ~80 relational/window/
# join queries whose oracles read those tables.  The documents/events
# axes caught ~15 divergence classes in r11; the relational family had
# only clean-data grammar fuzz + single-cell injections.
#
# Contracts KEPT (the same ingest-contract discipline as gen_events):
# - o_orderkey / c_custkey are UNIQUE and NON-NULL (primary keys: the
#   txlog merge_by_key path and every keyed-upsert query declare key
#   uniqueness; a dup PK is an ingest error, not a robustness finding).
# - dup-key STORMS therefore live on the FK/group side, where they are
#   legal data: one hot order owning up to ~half of lineitem, one hot
#   customer owning up to 100% of orders, group counts far past the
#   natural sf0.001 cardinalities.
# - amounts stay within |x| <= ~1e6: extreme-magnitude float sums break
#   every engine's scaled-int discipline equally (same bound gen_events
#   uses for value).
# - dates stay within [1900, 2199]: past pandas' datetime64[ns] range
#   the COMPARE harness (not either engine) becomes the thing under
#   test.  Epoch edges, pre-epoch, leap days, century non-leaps,
#   end-of-year microsecond boundaries, and exact-tie storms are all in.
# ---------------------------------------------------------------------------

MKTSEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

#: hostile replacements for dim/attribute strings: unicode, whitespace
#: pathologies, metacharacters, emptiness — the same pools the
#: documents axis uses, aimed at group keys and filter predicates
_HOSTILE_ATTRS = [
    "", " ", "  BUILDING ", "BUIL DING", "build-ing", "ビルディング",
    "мебель", "BÂTIMENT", "😀SEG", "a\tb", "x\ny", "100%", "_", "%",
    "O'Brien", 'say "hi"', "\\N", "ALL",
]

_HOSTILE_DATES_US = [
    # (Y, M, D, h, m, s, us)
    (1970, 1, 1, 0, 0, 0, 0),          # epoch zero
    (1969, 12, 31, 23, 59, 59, 999999),  # one us pre-epoch (negative)
    (1950, 6, 15, 12, 0, 0, 0),        # deep pre-epoch
    (1996, 2, 29, 0, 0, 0, 0),         # leap day
    (2000, 2, 29, 23, 59, 59, 0),      # century leap day (400 rule)
    (1900, 2, 28, 0, 0, 0, 0),         # century NON-leap boundary
    (1999, 12, 31, 23, 59, 59, 999999),  # end-of-year us boundary
    (2038, 1, 19, 3, 14, 7, 0),        # 32-bit time_t edge
    (2199, 12, 31, 0, 0, 0, 0),        # far future (inside ns range)
]


def _hostile_date_us(rng: np.random.Generator) -> int:
    """Microseconds since epoch for one hostile timestamp."""
    import datetime as dt

    y, mo, d, h, mi, s, us = _HOSTILE_DATES_US[
        int(rng.integers(0, len(_HOSTILE_DATES_US)))
    ]
    t = dt.datetime(y, mo, d, h, mi, s, us, tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1_000_000)


def _normal_date_us(rng: np.random.Generator) -> int:
    # the TPC-H-ish range the real testdata uses (1995-2001)
    base = 788_918_400_000_000  # 1995-01-01 UTC in us
    return base + int(rng.integers(0, 6 * 365)) * 86_400_000_000 + int(
        rng.integers(0, 86_400)
    ) * 1_000_000


def _amount(rng: np.random.Generator, null_p: float = 0.04) -> float | None:
    """Money-ish value: sane magnitudes plus zero/negative/boundary."""
    r = rng.random()
    if r < null_p:
        return None
    if r < null_p + 0.06:
        return 0.0
    if r < null_p + 0.12:  # negative (credit/chargeback shapes)
        return -float(np.round(rng.uniform(0.01, 9_999.99), 2))
    if r < null_p + 0.16:  # sub-cent residue (rounding discipline probe)
        return float(np.round(rng.uniform(0, 1), 4))
    if r < null_p + 0.18:
        return 999_999.99
    return float(np.round(rng.uniform(0.01, 99_999.99), 2))


def _attr(rng: np.random.Generator, normal_pool: list[str],
          null_p: float = 0.04, hostile_p: float = 0.25) -> str | None:
    r = rng.random()
    if r < null_p:
        return None
    if r < null_p + hostile_p:
        return str(rng.choice(_HOSTILE_ATTRS))
    return str(rng.choice(normal_pool))


def gen_relational(seed: int) -> dict[str, pa.Table]:
    """One deterministic hostile (customer, orders, lineitem) triple per
    seed.  Skew mode varies by seed: uniform / Zipfian / 100%-one-key."""
    rng = np.random.default_rng(seed ^ 0x7E1A7)
    n_cust = int(rng.integers(15, 180))
    n_orders = int(rng.integers(80, 1200))
    skew_mode = int(rng.integers(0, 3))  # 0 uniform, 1 zipf, 2 one-key

    # ---- customer ----------------------------------------------------
    cust_nation = [
        None if rng.random() < 0.03
        else int(rng.integers(25, 99)) if rng.random() < 0.04  # dangling
        else int(rng.integers(0, 25))
        for _ in range(n_cust)
    ]
    customer = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), type=pa.int64()),
            "c_name": pa.array(
                [_attr(rng, [f"Customer#{i:09d}" for i in range(3)])
                 for _ in range(n_cust)],
                type=pa.string(),
            ),
            "c_nationkey": pa.array(cust_nation, type=pa.int32()),
            "c_acctbal": pa.array(
                [_amount(rng) for _ in range(n_cust)], type=pa.float64()
            ),
            "c_mktsegment": pa.array(
                [_attr(rng, MKTSEGMENTS) for _ in range(n_cust)],
                type=pa.string(),
            ),
        }
    )

    # ---- orders ------------------------------------------------------
    if skew_mode == 2:
        hot = int(rng.integers(0, n_cust))
        custkeys = [hot] * n_orders  # 100%-one-key storm
    elif skew_mode == 1:
        z = rng.zipf(1.7, size=n_orders)
        custkeys = [int(v - 1) % n_cust for v in z]
    else:
        custkeys = [int(rng.integers(0, n_cust)) for _ in range(n_orders)]
    o_custkey = [
        None if rng.random() < 0.03
        else k + n_cust * 10 if rng.random() < 0.03  # dangling FK
        else k
        for k in custkeys
    ]
    # tie storms: runs of identical order timestamps (window tiebreaks)
    odates: list[int | None] = []
    t: int | None = None
    for _ in range(n_orders):
        r = rng.random()
        if r < 0.03:
            odates.append(None)
            continue
        if r < 0.18 and t is not None:
            odates.append(t)  # exact tie with a previous row
            continue
        t = (
            _hostile_date_us(rng)
            if rng.random() < 0.25
            else _normal_date_us(rng)
        )
        odates.append(t)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(n_orders), type=pa.int64()),
            "o_custkey": pa.array(o_custkey, type=pa.int64()),
            "o_orderstatus": pa.array(
                [_attr(rng, ["O", "F", "P"]) for _ in range(n_orders)],
                type=pa.string(),
            ),
            "o_totalprice": pa.array(
                [_amount(rng) for _ in range(n_orders)], type=pa.float64()
            ),
            "o_orderdate": pa.array(odates, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [_attr(rng, PRIORITIES) for _ in range(n_orders)],
                type=pa.string(),
            ),
        }
    )

    # ---- lineitem ----------------------------------------------------
    n_li = int(n_orders * rng.uniform(1.5, 5.0))
    if skew_mode == 2:
        hot_o = int(rng.integers(0, n_orders))
        li_orders = [
            hot_o if rng.random() < 0.5 else int(rng.integers(0, n_orders))
            for _ in range(n_li)
        ]  # one order owns ~half of lineitem
    else:
        li_orders = [int(rng.integers(0, n_orders)) for _ in range(n_li)]
    l_orderkey = [
        None if rng.random() < 0.02
        else k + n_orders * 10 if rng.random() < 0.02  # dangling FK
        else k
        for k in li_orders
    ]

    def _qty(r: float) -> float | None:
        if r < 0.04:
            return None
        if r < 0.08:
            return 0.0
        if r < 0.12:
            return -float(np.round(rng.uniform(1, 50), 0))
        if r < 0.16:
            return float(np.round(rng.uniform(0.1, 0.9), 2))  # fractional
        return float(int(rng.integers(1, 51)))

    def _rate(r: float) -> float | None:
        # discount/tax: legal [0, 0.1] plus 0, 1, negative, >1, and
        # < -1 (r13, r12 ADVICE item 1: a factor 1+d < 0 flips cumprod
        # negative-and-growing, exercising the NEGATIVE side of the
        # +/-2^53 saturation pin — previously an unexercised clamp)
        if r < 0.04:
            return None
        if r < 0.08:
            return 0.0
        if r < 0.11:
            return 1.0
        if r < 0.14:
            return -0.05
        if r < 0.16:
            return 1.5
        if r < 0.18:
            return -2.5
        return float(np.round(rng.uniform(0.0, 0.10), 2))

    ldates: list[int | None] = []
    lt: int | None = None
    for _ in range(n_li):
        r = rng.random()
        if r < 0.03:
            ldates.append(None)
            continue
        if r < 0.20 and lt is not None:
            ldates.append(lt)
            continue
        lt = (
            _hostile_date_us(rng)
            if rng.random() < 0.25
            else _normal_date_us(rng)
        )
        ldates.append(lt)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
            "l_partkey": pa.array(
                [None if rng.random() < 0.03 else int(rng.integers(0, 200))
                 for _ in range(n_li)],
                type=pa.int64(),
            ),
            "l_suppkey": pa.array(
                [None if rng.random() < 0.03 else int(rng.integers(0, 10))
                 for _ in range(n_li)],
                type=pa.int64(),
            ),
            "l_linenumber": pa.array(
                [None if rng.random() < 0.02
                 else int(rng.integers(-1, 8))
                 for _ in range(n_li)],
                type=pa.int32(),
            ),
            "l_quantity": pa.array(
                [_qty(rng.random()) for _ in range(n_li)], type=pa.float64()
            ),
            "l_extendedprice": pa.array(
                [_amount(rng) for _ in range(n_li)], type=pa.float64()
            ),
            "l_discount": pa.array(
                [_rate(rng.random()) for _ in range(n_li)],
                type=pa.float64(),
            ),
            "l_tax": pa.array(
                [_rate(rng.random()) for _ in range(n_li)],
                type=pa.float64(),
            ),
            "l_returnflag": pa.array(
                [_attr(rng, ["A", "N", "R"]) for _ in range(n_li)],
                type=pa.string(),
            ),
            "l_linestatus": pa.array(
                [_attr(rng, ["O", "F"]) for _ in range(n_li)],
                type=pa.string(),
            ),
            "l_shipdate": pa.array(ldates, type=pa.timestamp("us")),
        }
    )
    return {"customer": customer, "orders": orders, "lineitem": lineitem}


# ---------------------------------------------------------------------------
# Dim corpus (r12 fourth axis): hostile part/supplier attribute tables.
# Closes the five queries no other axis reaches (q_scalar_pack_str,
# q_sql_query, q_join_cross, q_sequence_zip, q_entity_match_blocked —
# they read only dim tables) and stresses the string-function oracle
# twins (trim/regex/split_part/lpad on unicode) where most historical
# divergences lived.  nation/region stay REAL: they are tiny fixed
# enumerations whose names are filter literals across the registry.
# Contracts kept: p_partkey/s_suppkey unique non-null, SAME key ranges
# as the real sf0.001 tables (0-199 / 0-9) so the real lineitem's FKs
# keep resolving; s_nationkey mostly valid with NULL/dangling tails.
# ---------------------------------------------------------------------------

_PART_TYPES = [
    "PROMO BURNISHED COPPER", "LARGE BRUSHED BRASS", "STANDARD POLISHED TIN",
    "SMALL PLATED NICKEL", "ECONOMY ANODIZED STEEL", "MEDIUM BURNISHED SILVER",
    "PROMO WRAPPED ZINC",
]


def gen_dims(seed: int) -> dict[str, pa.Table]:
    """One deterministic hostile (part, supplier) pair per seed."""
    rng = np.random.default_rng(seed ^ 0xD1A5)
    n_part, n_supp = 200, 10  # pinned to the real key ranges

    def name(normal: str) -> str | None:
        r = rng.random()
        if r < 0.05:
            return None
        if r < 0.10:
            return ""
        if r < 0.30:
            return str(rng.choice(_HOSTILE_ATTRS))
        if r < 0.45:
            return _unicode_soup(rng)[:60]
        if r < 0.55:
            return "  " + normal + " \t"  # whitespace-wrapped normal
        return normal

    part = pa.table(
        {
            "p_partkey": pa.array(range(n_part), type=pa.int64()),
            "p_name": pa.array(
                [name(f"lavender {i} metallic blue") for i in range(n_part)],
                type=pa.string(),
            ),
            "p_brand": pa.array(
                [name(f"Brand#{int(rng.integers(11, 56))}")
                 for _ in range(n_part)],
                type=pa.string(),
            ),
            "p_type": pa.array(
                [name(str(rng.choice(_PART_TYPES))) for _ in range(n_part)],
                type=pa.string(),
            ),
            "p_size": pa.array(
                [None if rng.random() < 0.05
                 else int(rng.integers(-3, 51))
                 for _ in range(n_part)],
                type=pa.int32(),
            ),
            "p_retailprice": pa.array(
                [_amount(rng) for _ in range(n_part)], type=pa.float64()
            ),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
            "s_name": pa.array(
                [name(f"Supplier#{i:09d}") for i in range(n_supp)],
                type=pa.string(),
            ),
            "s_nationkey": pa.array(
                [None if rng.random() < 0.1
                 else int(rng.integers(25, 99)) if rng.random() < 0.1
                 else int(rng.integers(0, 25))
                 for _ in range(n_supp)],
                type=pa.int32(),
            ),
            "s_acctbal": pa.array(
                [_amount(rng) for _ in range(n_supp)], type=pa.float64()
            ),
        }
    )
    return {"part": part, "supplier": supplier}


def gen_geo(seed: int) -> dict[str, pa.Table]:
    """One deterministic hostile (nation, region) pair per seed (r13,
    r12 VERDICT item 7: the only tables never fuzzed — tiny, but the
    TPC-H q5/q7/q8 oracles join THROUGH them and filter on their
    names).

    Contracts kept: n_nationkey / r_regionkey stay unique non-null
    0..N-1 (PKs; customer/supplier FKs must keep resolving), row
    counts stay 25/5 (broadcast-dim scale).  Hostile surface: names
    get NULL / '' / unicode-soup / whitespace-wrapped variants — with
    the REAL names kept ~half the time so literal filters
    (r_name = 'ASIA') stay non-trivially selective — and n_regionkey
    gets NULL / dangling values at a low rate (an inner join through
    region then legitimately drops those nations on both sides)."""
    rng = np.random.default_rng(seed ^ 0x6E0)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    nations = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
        "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
        "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
        "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
        "UNITED KINGDOM", "UNITED STATES",
    ]

    def name(normal: str) -> str | None:
        r = rng.random()
        if r < 0.05:
            return None
        if r < 0.10:
            return ""
        if r < 0.25:
            return str(rng.choice(_HOSTILE_ATTRS))
        if r < 0.35:
            return _unicode_soup(rng)[:30]
        if r < 0.50:
            return "  " + normal + " \t"
        return normal

    nation = pa.table(
        {
            "n_nationkey": pa.array(range(25), type=pa.int32()),
            "n_name": pa.array(
                [name(nations[i]) for i in range(25)], type=pa.string()
            ),
            "n_regionkey": pa.array(
                [
                    None if rng.random() < 0.08
                    else int(rng.integers(5, 9)) if rng.random() < 0.08
                    else int(rng.integers(0, 5))
                    for _ in range(25)
                ],
                type=pa.int32(),
            ),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(range(5), type=pa.int32()),
            "r_name": pa.array(
                [name(regions[i]) for i in range(5)], type=pa.string()
            ),
        }
    )
    return {"nation": nation, "region": region}
