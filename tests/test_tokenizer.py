"""Tokenizer goldens from the reference's tests (tests/test_text.cpp:35-52,
tests/test_n_gram.cpp:35-64) plus vectorized/scalar agreement."""

import numpy as np
import pandas as pd

from alexandria_spark.functions.hashing import hash64
from alexandria_spark.functions.tokenizer import (
    ngrams,
    query_terms,
    token_counts,
    tokenize,
    tokenize_series,
)


def test_reference_goldens():
    assert tokenize("C++ map. is the, best thing") == [
        "c++", "map", "is", "the", "best", "thing",
    ]
    assert tokenize("C# is also good.") == ["c#", "is", "also", "good"]


def test_boundaries_and_trim():
    # boundary set is " \t,|!" — '.' is NOT a boundary, only trimmed
    assert tokenize("a.b c") == ["a.b", "c"]
    assert tokenize("foo|bar!baz,qux\tzap") == ["foo", "bar", "baz", "qux", "zap"]
    # punct trimmed both ends, '+'/'#' kept
    assert tokenize("...c++...") == ["c++"]
    assert tokenize("(hello)") == ["hello"]
    # interleaved whitespace+punct trimmed greedily (trim_both union set)
    assert tokenize("foo.\n.") == ["foo"]
    # inner newline survives (not a boundary, not trimmed from middle)
    assert tokenize("a\nb") == ["a\nb"]


def test_max_word_len_bytes():
    assert tokenize("x" * 100) == ["x" * 100]
    assert tokenize("x" * 101) == []
    # 51 two-byte chars = 102 bytes > 100
    assert tokenize("é" * 51) == []
    assert tokenize("é" * 50) == ["é" * 50]


def test_ascii_only_lowercase():
    # C tolower lowercases the ASCII letters but leaves 'É' untouched
    assert tokenize("ÉCLAIR Abc") == ["Éclair", "abc"]
    assert tokenize("Abc ÉX") == ["abc", "Éx"]


def test_limit():
    assert tokenize("one two three four", limit=2) == ["one", "two"]


def test_vectorized_matches_scalar():
    docs = [
        "C++ map. is the, best thing",
        "C# is also good.",
        "",
        "  ,,, !!",
        "a.b|c d\te,f!g",
        "x" * 101 + " ok",
        "Abc ÉX naïve café,test",
    ]
    rows, words = tokenize_series(pd.Series(docs))
    expected_rows, expected_words = [], []
    for i, d in enumerate(docs):
        for w in tokenize(d):
            expected_rows.append(i)
            expected_words.append(w)
    assert rows.tolist() == expected_rows
    assert words.tolist() == expected_words


def test_token_counts():
    docs = pd.Series(["the cat the dog", "cat", ""])
    tc = token_counts(docs)
    got = {(r.row, r.term): (r.tf, r.doc_len) for r in tc.itertuples()}
    assert got == {
        (0, "the"): (2, 4),
        (0, "cat"): (1, 4),
        (0, "dog"): (1, 4),
        (1, "cat"): (1, 1),
    }
    for r in tc.itertuples():
        assert r.term_id == np.uint64(hash64(r.term)).astype(np.int64)


def test_query_terms_dedupe_and_cap():
    qt = query_terms("foo foo bar", limit=10)
    assert [t for t, _ in qt] == ["foo", "bar"]
    # >10 words truncates BEFORE dedupe (reference tokenizes with limit)
    q = " ".join(f"w{i}" for i in range(15))
    assert len(query_terms(q, limit=10)) == 10


def test_ngram_count_golden():
    # reference tests/test_n_gram.cpp: 9 words, n=3 -> 24 n-grams
    words = tokenize("the quick brown fox jumps over the lazy dog")
    assert len(words) == 9
    grams = ngrams(words, 3)
    assert len(grams) == 24
    assert grams[0] == "the"
    assert grams[1] == "the quick"
    assert grams[2] == "the quick brown"


def test_expanded_words_golden():
    # reference tests/test_text.cpp get_tokens3
    from alexandria_spark.functions.tokenizer import expanded_words

    assert expanded_words("Test. Ing! the    test   +func-tion+") == [
        "test", "ing", "the", "test", "+func-tion+", "+func", "tion+",
    ]


def test_snippets_goldens():
    # reference tests/test_text.cpp get_snippets
    from alexandria_spark.functions.tokenizer import snippets

    one = snippets("A small text that should fit in one snippet")
    assert one == ["A small text that should fit in one snippet"]
    zlib_text = (
        " The zlib compression library provides in-memory compression and "
        "decompression functions, including integrity checks of the "
        "uncompressed data. This version of the library supports only one "
        "compression method (deflation) but other algorithms will be added "
        "later and will have the same stream interface.  Compression can be "
        "done in a single step if the buffers are large enough (for example "
        "if an input file is mmap'ed), or can be done by repeated calls of "
        "the compression function. In the latter case, the application must "
        "provide more input and/or consume the output (providing more "
        "output space) before each call. "
    )
    assert len(snippets(zlib_text)) == 3
    assert all(len(s) <= 300 for s in snippets(zlib_text))


def test_words_without_stopwords_semantics(spark):
    """get_words_without_stopwords (reference text.cpp:334-353): keeps only
    clean words ([a-z0-9åäö]+, so 'c++' is dropped here unlike
    get_full_text_words) that are in neither the EN nor SV stopword list."""
    from alexandria_spark.operators.analysis import words_without_stopwords

    docs = spark.createDataFrame(
        [(1, "The quick c++ brown fox and och över the 42 zebra")],
        ["doc_id", "text"],
    )
    got = [r.term for r in words_without_stopwords(docs).orderBy("pos").collect()]
    assert got == ["quick", "brown", "fox", "42", "zebra"]
    assert "the" not in got and "and" not in got and "och" not in got
    assert "c++" not in got          # not a clean word
    assert "över" not in got         # swedish stopword
    assert "42" in got               # multi-digit numbers are not stopwords
    assert "4" not in got
    assert got[:3] == ["quick", "brown", "fox"]


def test_sanitize_utf8_invalid_bytes(spark):
    """Raw binary ingest with malformed UTF-8 must yield a valid string
    (bad sequences -> U+FFFD) whose valid parts tokenize unchanged — the
    reference's unicode::encode guard (tests/test_unicode.cpp:32-40)."""
    import pyspark.sql.functions as F

    from alexandria_spark.functions.tokenizer import sanitize_utf8, tokenize

    good = "hej jag heter josef och tillåter utf8 åäö chars$€ 是美国民主党"
    bad = "L\xe4gg i varukorg".encode("latin-1")  # 0xE4 invalid as UTF-8
    df = spark.createDataFrame(
        [(1, good.encode("utf-8")), (2, bad)], ["doc_id", "raw"]
    )
    out = {r["doc_id"]: r["text"] for r in df.select(
        "doc_id", sanitize_utf8(F.col("raw")).alias("text")
    ).collect()}
    # valid multi-byte text round-trips exactly
    assert out[1] == good
    # malformed byte replaced, remainder intact, result tokenizes cleanly
    assert "�" in out[2]
    assert out[2].endswith("gg i varukorg")
    assert tokenize(out[2])[-2:] == ["i", "varukorg"]
