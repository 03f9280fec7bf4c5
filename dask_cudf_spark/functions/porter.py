"""Full Porter stemmer (Porter 1980, steps 1a-5b) with a paired DuckDB
SQL translation generated FROM THE SAME RULE TABLES.

Parity design (the q_lang_id / q_ann_lsh oracle pattern): the engine
path is a pure-Python stemmer applied inside an Arrow-batched
pandas_udf (nvtext porter_stemmer, upstream cpp/src/text/stemmer.cu);
the oracle path is SQL emitted by ``porter_pipeline_sql`` — every rule
list is written once, so the two implementations cannot drift rule-by-
rule.  ``tests/test_text_functions.py`` additionally asserts word-level
identity between the two over the whole testdata vocabulary.

Algorithm notes (public spec, "An algorithm for suffix stripping"):
- cv form: consonant/vowel classification where 'y' is a vowel iff
  preceded by a consonant; measure m = number of VC groups.
- Longest-match-wins per step: once a suffix rule matches, its
  condition decides apply-or-not and NO shorter rule is tried.
- Words of length <= 2 are returned unchanged (the behavior of the
  published reference implementation).
"""

from __future__ import annotations

# (suffix, replacement) with condition m > 0
STEP2_RULES: list[tuple[str, str]] = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

# (suffix, replacement) with condition m > 0
STEP3_RULES: list[tuple[str, str]] = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

# suffixes dropped when m(stem) > 1; "ion" additionally requires the
# stem to end in s or t
STEP4_SUFFIXES: list[str] = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


# ----------------------------------------------------------------- python path

def build_porter_stem():
    """Factory returning a self-contained stemmer closure.

    The closure (and its nested helpers) reference nothing at module
    scope except the rule-table DATA, so cloudpickle serializes it BY
    VALUE — a Spark Python worker that cannot import this package (the
    driver was launched from an arbitrary cwd with only sys.path
    pointing here) can still run the UDF.  A module-level function
    would pickle by reference and crash such workers on import."""
    step2 = sorted(STEP2_RULES, key=lambda r: -len(r[0]))
    step3 = sorted(STEP3_RULES, key=lambda r: -len(r[0]))
    step4 = sorted(STEP4_SUFFIXES, key=lambda s: -len(s))

    def _cv(word):
        out = []
        for i, ch in enumerate(word):
            if ch in "aeiou":
                out.append("V")
            elif ch == "y" and i > 0 and out[i - 1] == "C":
                out.append("V")
            else:
                out.append("C")
        return "".join(out)

    def _m(stem):
        import re

        return len(re.findall(r"V+C+", _cv(stem)))

    def _has_vowel(stem):
        return "V" in _cv(stem)

    def _ends_double_c(word):
        return (
            len(word) >= 2
            and word[-1] == word[-2]
            and _cv(word).endswith("CC")
        )

    def _ends_cvc(word):
        return (
            len(word) >= 3
            and _cv(word).endswith("CVC")
            and word[-1] not in "wxy"
        )

    def stem(word):
        w = word
        if len(w) <= 2:
            return w

        # step 1a
        if w.endswith("sses"):
            w = w[:-4] + "ss"
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif w.endswith("ss"):
            pass
        elif w.endswith("s"):
            w = w[:-1]

        # step 1b (+ conditional cleanup when ed/ing actually stripped)
        fired = False
        if w.endswith("eed"):
            if _m(w[:-3]) > 0:
                w = w[:-1]
        elif w.endswith("ed"):
            if _has_vowel(w[:-2]):
                w = w[:-2]
                fired = True
        elif w.endswith("ing"):
            if _has_vowel(w[:-3]):
                w = w[:-3]
                fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_c(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _m(w) == 1 and _ends_cvc(w):
                w = w + "e"

        # step 1c
        if w.endswith("y") and _has_vowel(w[:-1]):
            w = w[:-1] + "i"

        # step 2
        for suf, repl in step2:
            if w.endswith(suf):
                if _m(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + repl
                break

        # step 3
        for suf, repl in step3:
            if w.endswith(suf):
                if _m(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + repl
                break

        # step 4
        for suf in step4:
            if w.endswith(suf):
                st = w[: -len(suf)]
                if _m(st) > 1 and (suf != "ion" or st.endswith(("s", "t"))):
                    w = st
                break

        # step 5a
        if w.endswith("e"):
            st = w[:-1]
            if _m(st) > 1 or (_m(st) == 1 and not _ends_cvc(st)):
                w = st

        # step 5b
        if _m(w) > 1 and _ends_double_c(w) and w.endswith("l"):
            w = w[:-1]

        return w

    return stem


#: module-level instance for driver-side use (tests, oracle parity);
#: being a factory product, it STILL pickles by value if captured in a
#: UDF closure (its __qualname__ is not resolvable in this module)
porter_stem = build_porter_stem()


# -------------------------------------------------------------- sql generation

def _sql_cv(e: str) -> str:
    """cv form of string expr `e` (same 3-pass construction as _cv: mark
    aeiou as V, then y-after-consonant as V, then the rest as C; a
    single global pass of the y rule suffices because a y whose
    predecessor became V in the same pass is correctly a consonant)."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{e}, '[aeiou]', 'V', 'g'), '([^V])y', '\\1V', 'g'), "
        "'[^V]', 'C', 'g')"
    )


def _sql_m(e: str) -> str:
    return f"len(regexp_extract_all({_sql_cv(e)}, 'V+C+'))"


def _sql_has_vowel(e: str) -> str:
    return f"({_sql_cv(e)} LIKE '%V%')"


def _sql_ends_double_c(e: str) -> str:
    return (
        f"(len({e}) >= 2 AND substr({e}, -1) = substr({e}, -2, 1)"
        f" AND {_sql_cv(e)} LIKE '%CC')"
    )


def _sql_ends_cvc(e: str) -> str:
    return (
        f"(len({e}) >= 3 AND {_sql_cv(e)} LIKE '%CVC'"
        f" AND substr({e}, -1) NOT IN ('w', 'x', 'y'))"
    )


def _sql_stem(e: str, n: int) -> str:
    return f"substr({e}, 1, len({e}) - {n})"


def _sql_m_rules(rules: list[tuple[str, str]]) -> str:
    """CASE chain for a longest-match-wins rule table with the m>0
    condition on the stem (steps 2 and 3)."""
    branches = []
    for suf, repl in sorted(rules, key=lambda r: -len(r[0])):
        stem = _sql_stem("w", len(suf))
        cond = f"{_sql_m(stem)} > 0"
        branches.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"CASE WHEN {cond} THEN {stem} || '{repl}' ELSE w END"
        )
    joined = "\n            ".join(branches)
    return f"CASE {joined}\n            ELSE w END"


def porter_pipeline_sql(tokens_cte: str) -> str:
    """Emit the full stemmer as chained CTEs over a token relation.

    `tokens_cte` must be SQL producing (doc_id, orig, w) with `w`
    lowercase; returns SQL whose final CTE `stemmed` has (doc_id, w)
    where `w` is the Porter stem (length<=2 originals pass through,
    matching porter_stem)."""
    step4_branches = []
    for suf in sorted(STEP4_SUFFIXES, key=lambda s: -len(s)):
        stem = _sql_stem("w", len(suf))
        cond = f"{_sql_m(stem)} > 1"
        if suf == "ion":
            cond += f" AND substr({stem}, -1) IN ('s', 't')"
        step4_branches.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"CASE WHEN {cond} THEN {stem} ELSE w END"
        )
    step4_case = "CASE " + "\n            ".join(step4_branches) + " ELSE w END"

    s = _sql_stem("w", 1)  # step 5a stem
    return f"""
    toks AS ({tokens_cte}),
    s1a AS (
        SELECT doc_id, orig,
            CASE WHEN w LIKE '%sses' THEN {_sql_stem('w', 4)} || 'ss'
                 WHEN w LIKE '%ies' THEN {_sql_stem('w', 3)} || 'i'
                 WHEN w LIKE '%ss' THEN w
                 WHEN w LIKE '%s' THEN {_sql_stem('w', 1)}
                 ELSE w END AS w
        FROM toks
    ),
    s1b0 AS (
        SELECT doc_id, orig,
            CASE WHEN w LIKE '%eed' THEN
                    CASE WHEN {_sql_m(_sql_stem('w', 3))} > 0
                         THEN {_sql_stem('w', 1)} ELSE w END
                 WHEN w LIKE '%ed' THEN
                    CASE WHEN {_sql_has_vowel(_sql_stem('w', 2))}
                         THEN {_sql_stem('w', 2)} ELSE w END
                 WHEN w LIKE '%ing' THEN
                    CASE WHEN {_sql_has_vowel(_sql_stem('w', 3))}
                         THEN {_sql_stem('w', 3)} ELSE w END
                 ELSE w END AS w,
            CASE WHEN w LIKE '%eed' THEN FALSE
                 WHEN w LIKE '%ed' THEN {_sql_has_vowel(_sql_stem('w', 2))}
                 WHEN w LIKE '%ing' THEN {_sql_has_vowel(_sql_stem('w', 3))}
                 ELSE FALSE END AS fired
        FROM s1a
    ),
    s1b AS (
        SELECT doc_id, orig,
            CASE WHEN NOT fired THEN w
                 WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz'
                     THEN w || 'e'
                 WHEN {_sql_ends_double_c('w')}
                      AND substr(w, -1) NOT IN ('l', 's', 'z')
                     THEN {_sql_stem('w', 1)}
                 WHEN {_sql_m('w')} = 1 AND {_sql_ends_cvc('w')}
                     THEN w || 'e'
                 ELSE w END AS w
        FROM s1b0
    ),
    s1c AS (
        SELECT doc_id, orig,
            CASE WHEN w LIKE '%y' AND {_sql_has_vowel(_sql_stem('w', 1))}
                 THEN {_sql_stem('w', 1)} || 'i' ELSE w END AS w
        FROM s1b
    ),
    s2 AS (
        SELECT doc_id, orig, {_sql_m_rules(STEP2_RULES)} AS w FROM s1c
    ),
    s3 AS (
        SELECT doc_id, orig, {_sql_m_rules(STEP3_RULES)} AS w FROM s2
    ),
    s4 AS (
        SELECT doc_id, orig, {step4_case} AS w FROM s3
    ),
    s5a AS (
        SELECT doc_id, orig,
            CASE WHEN w LIKE '%e' AND ({_sql_m(s)} > 1
                      OR ({_sql_m(s)} = 1 AND NOT {_sql_ends_cvc(s)}))
                 THEN {s} ELSE w END AS w
        FROM s4
    ),
    stemmed AS (
        SELECT doc_id,
            CASE WHEN len(orig) <= 2 THEN orig
                 WHEN {_sql_m('w')} > 1 AND {_sql_ends_double_c('w')}
                      AND w LIKE '%l'
                 THEN {_sql_stem('w', 1)} ELSE w END AS w
        FROM s5a
    )"""
