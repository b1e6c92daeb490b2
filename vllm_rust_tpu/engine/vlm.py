"""VLM engine: vision-language serving with per-slot embedding buffers.

Reference: crates/core/src/multimodal/processor.rs (process_image →
merge_embeddings) + encoder_cache.rs. TPU design: images are
preprocessed on host, encoded ONCE by a jitted vision-tower+projector
call at admission, and the projected embeddings live in a slot-indexed
device buffer; every prefill chunk's step injects them at image-token
positions via a host-computed per-token index (supports multiple images
and chunked prefill across span boundaries). Preemption-recompute
replays injection for free — the buffer outlives the pages.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..request import SamplingParams, Sequence
from ..scheduler import ScheduledSeq
from ..spec_decode.engine import SpecLLMEngine
from .encdec import _NullProposer


class VlmEngine(SpecLLMEngine):
    def __init__(
        self,
        model,
        params,
        config: EngineConfig,
        tokenizer=None,
        max_images_per_request: int = 4,
    ):
        assert getattr(model, "is_multimodal", False)
        super().__init__(
            model, params, config, tokenizer, proposer=_NullProposer()
        )
        h = model.text_config.hidden_size
        self.max_mm_tokens = model.tokens_per_image * max_images_per_request
        self.mm_buf = jnp.zeros(
            (self.num_slots + 1, self.max_mm_tokens, h), model.dtype
        )
        self._encode_jit = jax.jit(model.encode_images)
        # rid -> (projected embeds [n, H] device, [(span_start, span_len)])
        self._mm: dict[str, tuple[jax.Array, list[tuple[int, int]]]] = {}
        # encoder cache: image digest -> embeds (reference encoder_cache.rs
        # budgeted mm-hash cache; refcount-free here since entries are
        # device arrays shared by construction)
        self._encoder_cache: dict[str, jax.Array] = {}
        self.encoder_cache_budget = 64

    # -- admission ---------------------------------------------------------------

    def add_image_request(
        self,
        request_id: str,
        prompt_ids: list[int],
        images: list[np.ndarray],  # preprocessed [3, H, W] each
        params: SamplingParams | None = None,
    ) -> None:
        """Prompt ids contain one image-token per image; each expands to
        ``tokens_per_image`` positions (reference processor.rs
        process_content token expansion)."""
        img_tok = self.model.image_token_index
        n = self.model.tokens_per_image
        expanded: list[int] = []
        spans: list[tuple[int, int]] = []
        n_imgs = 0
        for tok in prompt_ids:
            if tok == img_tok:
                spans.append((len(expanded), n))
                expanded.extend([img_tok] * n)
                n_imgs += 1
            else:
                expanded.append(tok)
        if n_imgs != len(images):
            raise ValueError(
                f"prompt has {n_imgs} image tokens but {len(images)} images"
            )
        if n_imgs * n > self.max_mm_tokens:
            raise ValueError(
                f"{n_imgs} images exceed the {self.max_mm_tokens}-token "
                "multimodal budget"
            )
        if images:
            embeds = jnp.concatenate(
                [self._encode_cached(img) for img in images], axis=0
            )
            self._mm[request_id] = (embeds, spans)
        self.add_request(request_id, expanded, params)

    def _encode_cached(self, img: np.ndarray) -> jax.Array:
        key = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()
        e = self._encoder_cache.get(key)
        if e is None:
            e = self._encode_jit(self.params, jnp.asarray(img)[None])
            if len(self._encoder_cache) >= self.encoder_cache_budget:
                self._encoder_cache.pop(next(iter(self._encoder_cache)))
            self._encoder_cache[key] = e
        return e

    # -- engine hooks --------------------------------------------------------------

    def _assign_slot(self, seq: Sequence) -> None:
        super()._assign_slot(seq)
        mm = self._mm.get(seq.request_id)
        if mm is not None:
            e, _ = mm
            self.mm_buf = self.mm_buf.at[seq.slot, : e.shape[0]].set(
                e.astype(self.mm_buf.dtype)
            )

    def _build_mm(self, scheduled: list[ScheduledSeq], t_pad: int):
        mm_idx = np.full(t_pad, -1, np.int32)
        any_mm = False
        offset = 0
        for sch in scheduled:
            seq, nt = sch.seq, sch.num_tokens
            mm = self._mm.get(seq.request_id)
            if mm is not None:
                _, spans = mm
                start = seq.num_computed_tokens
                base = 0
                for s0, ln in spans:
                    lo, hi = max(start, s0), min(start + nt, s0 + ln)
                    if lo < hi:
                        any_mm = True
                        rel = np.arange(lo, hi)
                        mm_idx[offset + (lo - start) : offset + (hi - start)] = (
                            base + rel - s0
                        )
                    base += ln
            offset += nt
        if not any_mm:
            return None
        return self.mm_buf, jnp.asarray(mm_idx)

    def _finish(self, seq, reason, stop_reason=None) -> None:
        super()._finish(seq, reason, stop_reason)
        self._mm.pop(seq.request_id, None)

    # -- server-facing helpers ------------------------------------------------

    def preprocess(self, image) -> np.ndarray:
        """Raw image (bytes / base64 str / HWC array) -> [3, S, S] pixel
        values matching the vision tower's normalization."""
        from ..models.vision import CLIPVisionTower
        from ..multimodal.image import (
            CLIP_MEAN,
            CLIP_STD,
            SIGLIP_MEAN,
            SIGLIP_STD,
            load_image,
            preprocess_image,
        )

        if isinstance(image, (bytes, str)):
            image = load_image(image)
        is_clip = isinstance(self.model.vision, CLIPVisionTower)
        size = self.model.vision.image_size
        return preprocess_image(
            image,
            size=size,
            crop=size,
            mean=CLIP_MEAN if is_clip else SIGLIP_MEAN,
            std=CLIP_STD if is_clip else SIGLIP_STD,
        )
