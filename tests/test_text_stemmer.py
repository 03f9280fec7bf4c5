"""Porter stemmer + subword tokenizer: Python/SQL twin parity.

The engine path (pure Python inside pandas_udf) and the oracle path
(generated DuckDB SQL) are built from the same rule tables; these tests
drive both over the full testdata vocabulary plus hypothesis-generated
words so any rule drift fails word-by-word, not just via the aggregate
oracle hash.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_cudf_spark.functions.porter import porter_pipeline_sql, porter_stem
from dask_cudf_spark.functions.subword import (
    VOCAB,
    piece_id,
    subword_oracle_sql,
    subword_pieces,
)

from .conftest import SF_DIR

# canonical vectors from the published Porter test set
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_canonical_vectors():
    for word, want in PORTER_VECTORS.items():
        assert porter_stem(word) == want, f"{word}: {porter_stem(word)} != {want}"


def _sql_stems(words: list[str]) -> list[str]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE wt AS SELECT ROW_NUMBER() OVER () AS doc_id, "
        "w AS orig, w FROM (SELECT unnest(?) AS w)",
        [words],
    )
    sql = (
        "WITH "
        + porter_pipeline_sql("SELECT doc_id, orig, w FROM wt")
        + " SELECT doc_id, w FROM stemmed ORDER BY doc_id"
    )
    return [r[1] for r in con.execute(sql).fetchall()]


def test_porter_sql_twin_on_testdata_vocab():
    """Word-level identity of the Python and generated-SQL stemmers over
    every distinct token in the documents table."""
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY w"
        ).fetchall()
    ]
    assert len(vocab) > 10
    got = _sql_stems(vocab)
    want = [porter_stem(w) for w in vocab]
    assert got == want


@settings(deadline=None, max_examples=30)
@given(
    st.lists(
        st.text(alphabet="abcdefgilmnoprstyz", min_size=1, max_size=12),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_porter_sql_twin_on_random_words(words):
    assert _sql_stems(words) == [porter_stem(w) for w in words]


# ------------------------------------------------------------- subword


def test_subword_roundtrip_and_fallback():
    for w in ["table", "customer", "xyzzy", "q", "windowing", ""]:
        pieces = subword_pieces(w)
        assert "".join(pieces) == w  # segmentation covers the word
    assert subword_pieces("") == []
    # unknown chars fall back to single-char pieces
    assert subword_pieces("zz") == ["z", "z"]


def test_subword_greedy_longest_match():
    # 'tab' (len 3) must beat 'ta' prefix via 'th'... pick a clear case:
    # 'table' -> ['tab','le'] not ['t','a','b',...]
    assert subword_pieces("table") == ["tab", "le"]
    assert subword_pieces("customer") == ["cust", "omer"]


def test_subword_sql_twin_word_level():
    words = sorted(
        {"table", "customer", "windowing", "sparkstream", "xq", "merge",
         "aggregate", "vectorize", *VOCAB}
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE wt(doc_id BIGINT, w VARCHAR)")
    for i, w in enumerate(words):
        con.execute("INSERT INTO wt VALUES (?, ?)", [i, w])
    sql = subword_oracle_sql("SELECT doc_id, w FROM wt")
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(sql + " ORDER BY doc_id").fetchall()
    }
    for i, w in enumerate(words):
        pieces = subword_pieces(w)
        want = (
            len(pieces),
            len(set(pieces)),
            sum(piece_id(p) for p in pieces),
        )
        assert got[i] == want, f"{w}: {got[i]} != {want}"


def test_udf_closures_pickle_by_value():
    """The stemmer/tokenizer closures must survive unpickling in a
    process that CANNOT import dask_cudf_spark (Spark workers when the
    driver ran from a foreign cwd with only sys.path pointing at the
    repo — the external harness's setup).  Factory-produced closures
    pickle by value; a module-level function would pickle by reference
    and reintroduce the worker ImportError this guards against."""
    import pickle
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    payload = cloudpickle.dumps(
        (porter_stem, subword_pieces, piece_id)
    )
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(payload)
        path = f.name
    # fresh interpreter, no repo on sys.path: unpickle and execute
    code = (
        "import pickle,sys\n"
        f"stem, pieces, pid = pickle.load(open({path!r}, 'rb'))\n"
        "assert 'dask_cudf_spark' not in sys.modules\n"
        "assert stem('caresses') == 'caress'\n"
        "assert pieces('table') == ['tab', 'le']\n"
        "assert pid('le') >= 0\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/tmp",
        env={"PATH": "/usr/bin:/bin"},
    )
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr


@pytest.mark.parametrize("piece", ["tab", "le", "e", "x", "zz"])
def test_piece_id_matches_duckdb_hash(piece):
    con = duckdb.connect()
    (got,) = con.execute(
        "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT) % 30000",
        [piece],
    ).fetchone()
    assert got == piece_id(piece)
