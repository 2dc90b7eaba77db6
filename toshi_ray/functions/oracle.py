"""Brute-force reference scorer — independent implementation of SURVEY.md §2.5.

Used only by tests and golden generation (FIXTURES.md §F6): a plain
dict/NumPy implementation of BM25 with global stats, byte-quantized
fieldnorms and (score desc, doc_id asc) tie-breaks. It deliberately
shares NOTHING with the engine's execution path except the analyzer
(which *defines* the vocabulary) and the fieldnorm table (which
*defines* the quantization) — postings, stats and scoring are all
recomputed from scratch per query, so an agreement between engine and
oracle exercises codecs, segmenting, merging, stats broadcast and the
distributed top-k merge.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from toshi_ray.analyzer import get_analyzer
from toshi_ray.fieldnorm import fieldnorm_to_id, id_to_fieldnorm

K1 = 1.2
B = 0.75


class BruteForceIndex:
    def __init__(self, docs: list[dict], text_fields: dict[str, str]):
        """docs: list of {doc_id, field: text...}; text_fields: name → tokenizer."""
        self.docs = docs
        self.n = len(docs)
        self.tokens: dict[str, list[list[str]]] = {}
        self.norms: dict[str, np.ndarray] = {}
        self.avgdl: dict[str, float] = {}
        self.postings: dict[str, dict[str, list[tuple[int, int, list[int]]]]] = {}
        self.doc_ids = np.array([d["doc_id"] for d in docs], dtype=np.uint64)
        for f, tok in text_fields.items():
            an = get_analyzer(tok)
            toks = [an.tokens(d.get(f) or "") for d in docs]
            self.tokens[f] = toks
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            self.norms[f] = id_to_fieldnorm(fieldnorm_to_id(lens)).astype(np.float64)
            self.avgdl[f] = lens.sum() / self.n if self.n else 0.0
            post: dict[str, list[tuple[int, int, list[int]]]] = defaultdict(list)
            for i, ts in enumerate(toks):
                cnt = Counter(ts)
                pos = defaultdict(list)
                for p, t in enumerate(ts):
                    pos[t].append(p)
                for t, c in cnt.items():
                    post[t].append((i, c, pos[t]))
            self.postings[f] = post

    def idf(self, field: str, term: str) -> float:
        df = len(self.postings[field].get(term, []))
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def _score(self, field: str, i: int, tf: float, w_idf: float) -> float:
        dl = self.norms[field][i]
        return w_idf * (K1 + 1.0) * tf / (tf + K1 * (1 - B + B * dl / self.avgdl[field]))

    def term_scores(self, field: str, term: str) -> dict[int, float]:
        w = self.idf(field, term)
        return {
            i: self._score(field, i, tf, w)
            for i, tf, _ in self.postings[field].get(term, [])
        }

    def phrase_scores(self, field: str, terms: list[str], offsets=None) -> dict[int, float]:
        offsets = offsets or list(range(len(terms)))
        w = sum(self.idf(field, t) for t in terms)
        per = [dict((i, set(p)) for i, _, p in self.postings[field].get(t, [])) for t in terms]
        docs = set(per[0])
        for d in per[1:]:
            docs &= set(d)
        out = {}
        for i in docs:
            ptf = sum(
                1
                for p in per[0][i]
                if all((p + offsets[j] - offsets[0]) in per[j][i] for j in range(1, len(terms)))
            )
            if ptf:
                out[i] = self._score(field, i, ptf, w)
        return out

    def topk(self, scores: dict[int, float], k: int) -> list[tuple[int, float]]:
        rows = [(int(self.doc_ids[i]), s) for i, s in scores.items()]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]
