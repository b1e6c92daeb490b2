"""Encoder runner: embeddings / score / rerank / classify over
BERT-family models.

Reference: the server's embeddings/score/rerank/classify/pooling
endpoints (crates/server/src/api/embeddings.rs) backed by encoder
models. One-shot bidirectional encodes over bucketed flat batches; no
scheduler, no KV (mirrors EngineCommand::Embed's bypass path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import pick_bucket

DEFAULT_BUCKETS = (32, 64, 128, 256, 512)


class EncoderRunner:
    def __init__(
        self,
        model,
        params,
        tokenizer=None,
        token_buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        max_batch_tokens: int | None = None,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.token_buckets = token_buckets
        self.max_batch_tokens = max_batch_tokens or token_buckets[-1]
        self.cls_id = getattr(tokenizer, "cls_token_id", None)
        self.sep_id = getattr(tokenizer, "sep_token_id", None)
        self._encode_jit = jax.jit(self.model.encode)
        self._pool_jit = jax.jit(self.model.pool, static_argnames=("pooling",))
        self._cls_jit = jax.jit(self.model.classify_logits)

    # -- tokenization -----------------------------------------------------------

    def _ids(self, x) -> list[int]:
        if isinstance(x, str):
            if self.tokenizer is None:
                raise ValueError("string input requires a tokenizer")
            return self.tokenizer.encode(x)
        return list(x)

    def _pair_ids(self, a, b) -> tuple[list[int], list[int]]:
        """Cross-encoder input [CLS] a [SEP] b [SEP] with token types."""
        a_ids, b_ids = self._ids(a), self._ids(b)
        # strip specials the tokenizer may have added; re-add explicitly
        for ids in (a_ids, b_ids):
            if self.cls_id is not None and ids and ids[0] == self.cls_id:
                ids.pop(0)
            if self.sep_id is not None and ids and ids[-1] == self.sep_id:
                ids.pop()
        cls = [self.cls_id] if self.cls_id is not None else []
        sep = [self.sep_id] if self.sep_id is not None else []
        ids = cls + a_ids + sep + b_ids + sep
        types = [0] * (len(cls) + len(a_ids) + len(sep)) + [1] * (
            len(b_ids) + len(sep)
        )
        return ids, types

    # -- batched dispatch ---------------------------------------------------------

    def _run(self, items: list[tuple[list[int], list[int]]], fn):
        """Group (ids, type_ids) items into bucketed batches, apply
        ``fn(hidden, cu [S+1]) -> [S, ...]`` per batch."""
        results = []
        i = 0
        while i < len(items):
            group = []
            total = 0
            while i < len(items):
                n = len(items[i][0])
                if n == 0:
                    raise ValueError("cannot encode an empty input")
                if n > self.max_batch_tokens:
                    raise ValueError(
                        f"input of {n} tokens exceeds max {self.max_batch_tokens}"
                    )
                if total + n > self.max_batch_tokens and group:
                    break
                group.append(items[i])
                total += n
                i += 1
            t_pad = pick_bucket(total, self.token_buckets)
            ids = np.zeros(t_pad, np.int32)
            types = np.zeros(t_pad, np.int32)
            cu = np.zeros(len(group) + 1, np.int32)
            off = 0
            for j, (g_ids, g_types) in enumerate(group):
                n = len(g_ids)
                ids[off : off + n] = g_ids
                types[off : off + n] = g_types
                cu[j + 1] = cu[j] + n
                off += n
            hidden = self._encode_jit(
                self.params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(cu)
            )
            results.append(np.asarray(fn(hidden, jnp.asarray(cu))))
        return np.concatenate(results, axis=0)

    # -- public API ---------------------------------------------------------------

    def embed(
        self, inputs: list, *, pooling: str = "mean", normalize: bool = True
    ) -> np.ndarray:
        items = [(self._ids(x), [0] * len(self._ids(x))) for x in inputs]

        def fn(hidden, cu):
            emb = self._pool_jit(self.params, hidden, cu, pooling=pooling)
            if normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
                )
            return emb

        return self._run(items, fn)

    def score(self, pairs: list[tuple]) -> np.ndarray:
        """Cross-encoder relevance scores for (query, document) pairs
        (reference /score endpoint). Single-label heads return the raw
        logit (sigmoid applied by the API layer when requested)."""
        items = [self._pair_ids(a, b) for a, b in pairs]
        out = self._run(
            items, lambda h, cu: self._cls_jit(self.params, h, cu)
        )
        return out[:, 0] if out.shape[1] == 1 else out.max(-1)

    def rerank(self, query, documents: list) -> list[dict]:
        """Score every document against the query, sorted desc."""
        scores = self.score([(query, d) for d in documents])
        order = np.argsort(-scores)
        return [
            {"index": int(k), "relevance_score": float(scores[k]),
             "document": documents[k]}
            for k in order
        ]

    def classify(self, inputs: list) -> np.ndarray:
        """Per-input class probabilities [N, num_labels]."""
        items = [(self._ids(x), [0] * len(self._ids(x))) for x in inputs]
        logits = self._run(items, lambda h, cu: self._cls_jit(self.params, h, cu))
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
