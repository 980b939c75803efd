"""Engine configuration.

Defaults mirror the reference's serving/build constants (see BASELINE.md):
  - BM25 k1=1.2 b=0.75           (reference src/indexer/sharded_builder.h:192-193)
  - query_max_words=10           (reference src/config.cpp:79)
  - result_limit=1000            (reference src/config.cpp:83)
  - pre_result_limit=200000      (reference src/config.cpp:82)
  - deduplicate_domain_count=5   (reference src/config.cpp:81)
  - short-doc suppression (doc_len<1000 -> score 0,
    reference src/indexer/sharded_builder.h:177-181) is a flag, default OFF
    for code corpora (code files are usually <1000 tokens).

Scale knobs are sandbox-sized by default; at cluster scale raise
num_shards (reference uses 4001) and build_waves.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- scoring (BM25, reference sharded_builder.h:175-201) ---
    k1: float = 1.2
    b: float = 0.75
    short_doc_zero: bool = False      # zero score when doc_len < short_doc_min
    short_doc_min: int = 1000

    # --- tokenizer (reference text.cpp:109-130) ---
    max_word_len: int = 100           # bytes (CC_MAX_WORD_LEN, text.h:29)
    query_max_words: int = 10         # config.cpp:79

    # --- serving limits ---
    result_limit: int = 1000          # config.cpp:83
    pre_result_limit: int = 200_000   # config.cpp:82
    dedup_group_count: int = 5        # per-"domain" cap, config.cpp:81

    # --- index layout ---
    num_shards: int = 32              # term-hash shards (reference: 4001)
    block_size: int = 4096            # postings per compressed block
    max_postings_per_salt: int = 262_144  # skewed-term salting threshold
    keep_tf: bool = True              # store tf alongside score in blocks

    # --- build orchestration ---
    build_waves: int = 4              # checkpoint granularity for shard builds
    shuffle_partitions: int = 32

    # --- incremental maintenance ---
    # partial refreshes keep corpus-global BM25 stats (n_docs/avg_dl) at
    # their last-full-refresh values; once the docs appended since that
    # anchor exceed this fraction of the anchored n_docs, a partial refresh
    # auto-escalates to a full refresh (the reference merger daemon's final
    # append+merge, merger.cpp:176-181, plays the same re-anchoring role)
    max_stale_doc_ratio: float = 0.10

    # --- misc ---
    n_grams: int = 1                  # reference config.cpp:86 default
    expand_blend: bool = False        # index expanded blend-char sub-words
                                      # (get_expanded_full_text_words,
                                      #  reference text.cpp:253-285)

    def salts_for_df(self, df: int) -> int:
        """Number of salt buckets for a term with document frequency df."""
        return max(1, -(-int(df) // self.max_postings_per_salt))


DEFAULT = EngineConfig()

# Character classes shared by the tokenizer and its SQL oracle.
# C-locale whitespace (isspace) and punctuation (ispunct) minus '+'/'#'
# (reference text.h:44-49 my_ispunct keeps '+' and '#' so "c++"/"c#" survive).
WHITESPACE = " \t\n\v\f\r"
PUNCT_NO_PLUS_HASH = "!\"$%&'()*,-./:;<=>?@[\\]^_`{|}~"
TRIM_CHARS = WHITESPACE + PUNCT_NO_PLUS_HASH
WORD_BOUNDARY = " \t,|!"  # reference text.cpp:111
