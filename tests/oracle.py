"""Brute-force pandas BM25 oracle.

Independent reimplementation of the reference's scoring semantics
(reference src/indexer/sharded_builder.h:175-201): normalized tf
f_q = tf/doc_len, k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1),
per-(term,doc) score stored as float32 (the reference computes in double,
stores float — sharded_builder.h:196-199), per-doc query score = float64
sum of the float32 per-term scores, ranked score desc then doc_id asc in
unsigned 64-bit order (index_manager.cpp:279-282, generic_record.h:50-59).

Uses the (golden-tested) tokenizer; everything else is independent pandas.
"""

from __future__ import annotations

import numpy as np

from alexandria_spark.config import EngineConfig
from alexandria_spark.functions.tokenizer import query_terms, tokenize


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], cfg: EngineConfig | None = None):
        from alexandria_spark.functions.tokenizer import ngrams

        self.cfg = cfg or EngineConfig()
        self.tf: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs:
            words = tokenize(text)
            if not words:
                continue
            self.doc_len[doc_id] = len(words)  # unigram count, even with n-grams
            for w in ngrams(words, self.cfg.n_grams) if self.cfg.n_grams > 1 else words:
                self.tf.setdefault(w, {})
                self.tf[w][doc_id] = self.tf[w].get(doc_id, 0) + 1
        self.n_docs = len(self.doc_len)
        self.avg_dl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 0.0

    def score(self, term: str, doc_id: int) -> np.float32:
        cfg = self.cfg
        tf = self.tf[term][doc_id]
        dl = self.doc_len[doc_id]
        if cfg.short_doc_zero and dl < cfg.short_doc_min:
            return np.float32(0.0)
        df = len(self.tf[term])
        idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
        f_q = tf / dl
        s = idf * (f_q * (cfg.k1 + 1.0)) / (f_q + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avg_dl))
        return np.float32(s)

    def search(self, query: str, mode: str = "and", k: int = 10) -> list[tuple[int, float]]:
        if mode == "phrase":
            words = tokenize(query, limit=self.cfg.query_max_words)
            terms = [" ".join(words)] if words else []
        else:
            terms = [t for t, _ in query_terms(query, limit=self.cfg.query_max_words)]
        if not terms:
            return []
        acc: dict[int, tuple[float, int]] = {}
        for t in terms:
            for doc_id in self.tf.get(t, {}):
                s = float(self.score(t, doc_id))
                prev = acc.get(doc_id, (0.0, 0))
                acc[doc_id] = (prev[0] + s, prev[1] + 1)
        items = [
            (doc_id, s)
            for doc_id, (s, nt) in acc.items()
            if mode != "and" or nt == len(terms)
        ]
        items.sort(key=lambda x: (-x[1], np.int64(x[0]).astype(np.uint64)))
        return items[:k]
