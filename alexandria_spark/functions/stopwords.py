"""Stopword filtering with the reference's English + Swedish lists.

Re-expresses ``text::get_words_without_stopwords`` (reference
src/text/text.cpp:334-353): tokenize with the standard boundary/trim rules,
then keep only *clean* words (every codepoint in [a-z0-9åäö],
text.cpp:31-56 is_clean_char/is_clean_word) that are not in the EN or SV
stopword set (src/text/stopwords.cpp:35-290, stopwords::is_stop_word).

The word lists are data, reproduced verbatim from the reference (they ARE
the spec); the filtering itself is JVM-side — an ``isin`` against a literal
set plus one ``rlike`` — so it rides whole-stage codegen with no Python in
the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# reference src/text/stopwords.cpp:35-149 (s_english)
ENGLISH = frozenset("""
the of and in to a is as for was by that with on from are an or it at his be
which this he were not also has have its their but first had one other new
they such been can after more who two all some most may into when between
than there these during only many time would states no over about while use
both if where then i through since being made became part her de three any
up each them often will him so out same because well several form name could
although set different 1 2 3 4 5 6 7 8 9 0
""".split())

# reference src/text/stopwords.cpp:150-290 (s_swedish)
SWEDISH = frozenset("""
och i av som en att till den med på är för det de ett var från har om vid
inte även eller sig men efter man kan sin där andra hade blev då första
finns mot sedan så genom över detta också bland mellan två när fick samt
skulle annat dock denna inom olika vilket ut flera se vara upp ha senare
många kom än dessa alla samma del stora sitt sina mycket tre mer utan nya
ofta enligt blir några kunde hela gjorde varit här ska eftersom få fanns
bara något kommer både kallas vissa får cirka ur endast tog dem medan redan
fyra någon nu går innan bli allt därefter därför hur varje per åt antal
delen vilken vad helt sätt vill åren gör kallade främst båda själv
1 2 3 4 5 6 7 8 9 0
""".split())

STOPWORDS = ENGLISH | SWEDISH

# is_clean_char admits ascii [a-z0-9] plus the 2-byte codepoints å ä ö
CLEAN_WORD_RE = "^[a-z0-9åäö]+$"


def is_stop_word(col):
    """Column predicate: word is in the EN or SV stopword list."""
    return col.isin(*sorted(STOPWORDS))


def is_clean_word(col):
    """Column predicate: every codepoint in [a-z0-9åäö] (text.cpp:40-56)."""
    return col.rlike(CLEAN_WORD_RE)


def keep_word(col):
    """The get_words_without_stopwords retention predicate."""
    return is_clean_word(col) & ~is_stop_word(col)


def sql_keep_word(expr: str) -> str:
    """DuckDB restatement of ``keep_word`` for the oracle side."""
    words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return (
        f"regexp_full_match({expr}, '[a-z0-9åäö]+') "
        f"AND {expr} NOT IN ({words})"
    )
