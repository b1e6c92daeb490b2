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
        # anyres models produce more tokens than tokens_per_image
        # (base view + tile grid + newline rows): size the slot buffer
        # for the model's declared worst case
        per_image = getattr(model, "max_image_tokens", model.tokens_per_image)
        self.max_mm_tokens = per_image * max_images_per_request
        self.mm_buf = jnp.zeros(
            (self.num_slots + 1, self.max_mm_tokens, h), model.dtype
        )
        self._encode_jit = jax.jit(model.encode_images)
        # rid -> (projected embeds [n, H] device, [(span_start, span_len)])
        self._mm: dict[str, tuple[jax.Array, list[tuple[int, int]]]] = {}
        # encoder cache (reference encoder_cache.rs:32-351): LRU over a
        # BYTE budget with per-entry refcounts — an entry referenced by a
        # live request is never evicted
        self._encoder_cache: dict[str, jax.Array] = {}  # insertion = LRU order
        self._cache_refs: dict[str, int] = {}
        self._req_keys: dict[str, list[str]] = {}
        self.encoder_cache_bytes = 256 << 20  # 256 MiB
        self._cache_used = 0

    # -- admission ---------------------------------------------------------------

    def add_image_request(
        self,
        request_id: str,
        prompt_ids: list[int],
        images: list,  # [3, H, W] arrays, or (pixel_values [P,3,S,S],
        # (orig_h, orig_w)) tuples for anyres models (LLaVA-NeXT)
        params: SamplingParams | None = None,
    ) -> None:
        """Prompt ids contain one image-token per image; each expands to
        that image's token count (reference processor.rs process_content
        token expansion). Images are encoded FIRST so anyres inputs —
        whose token counts depend on the tile grid — expand exactly."""
        img_tok = self.model.image_token_index
        n_placeholders = sum(1 for t in prompt_ids if t == img_tok)
        if n_placeholders != len(images):
            raise ValueError(
                f"prompt has {n_placeholders} image tokens but "
                f"{len(images)} images"
            )
        encoded = [self._encode_cached(img, request_id) for img in images]
        lens = [int(e.shape[0]) for e in encoded]
        if sum(lens) > self.max_mm_tokens:
            raise ValueError(
                f"{sum(lens)} image tokens exceed the {self.max_mm_tokens}-"
                "token multimodal budget"
            )
        expanded: list[int] = []
        spans: list[tuple[int, int]] = []
        it = iter(lens)
        for tok in prompt_ids:
            if tok == img_tok:
                n = next(it)
                spans.append((len(expanded), n))
                expanded.extend([img_tok] * n)
            else:
                expanded.append(tok)
        if encoded:
            self._mm[request_id] = (jnp.concatenate(encoded, axis=0), spans)
        self.add_request(request_id, expanded, params)
        if self._use_mrope and spans:
            from ..multimodal.mrope import mrope_positions

            pos, delta = mrope_positions(
                len(expanded), spans,
                [(1, int(round(n ** 0.5)), int(round(n ** 0.5)))
                 for _, n in spans],
            )
            seq = self.requests[request_id]
            seq.mrope_pos, seq.mrope_delta = pos, delta

    def add_audio_request(
        self,
        request_id: str,
        prompt_ids: list[int],
        audios: list,  # mel spectrograms [n_mels, frames]
        params: SamplingParams | None = None,
    ) -> None:
        """Audio input for dual-modality models (Qwen2.5-Omni thinker):
        placeholder = model.audio_token_id, encoder = model.encode_audio.
        Audio spans carry no mrope grid — HF's get_rope_index advances
        audio positions 1-D/temporally, which equals the text path here.
        Single-modality audio LMMs (Qwen2-Audio, Voxtral, Ultravox) set
        image_token_index to the audio token and route encode_images to
        the audio encoder, so they keep using add_image_request."""
        aud_tok = int(getattr(self.model, "audio_token_id", -1))
        enc = getattr(self.model, "encode_audio", None)
        if aud_tok < 0 or enc is None:
            # single-modality audio LMM: the image path IS the audio path
            return self.add_image_request(
                request_id, prompt_ids, audios, params
            )
        if not hasattr(self, "_encode_audio_jit"):
            self._encode_audio_jit = jax.jit(enc)
        n_placeholders = sum(1 for t in prompt_ids if t == aud_tok)
        if n_placeholders != len(audios):
            raise ValueError(
                f"prompt has {n_placeholders} audio tokens but "
                f"{len(audios)} audio inputs"
            )
        encoded = [
            self._encode_cached(a, request_id, jit_fn=self._encode_audio_jit)
            for a in audios
        ]
        lens = [int(e.shape[0]) for e in encoded]
        if sum(lens) > self.max_mm_tokens:
            raise ValueError(
                f"{sum(lens)} audio tokens exceed the {self.max_mm_tokens}-"
                "token multimodal budget"
            )
        expanded: list[int] = []
        spans: list[tuple[int, int]] = []
        it = iter(lens)
        for tok in prompt_ids:
            if tok == aud_tok:
                n = next(it)
                spans.append((len(expanded), n))
                expanded.extend([aud_tok] * n)
            else:
                expanded.append(tok)
        if encoded:
            self._mm[request_id] = (jnp.concatenate(encoded, axis=0), spans)
        self.add_request(request_id, expanded, params)

    def add_video_request(
        self,
        request_id: str,
        prompt_ids: list[int],
        frames,  # list of data-URLs / bytes / HWC arrays, or [F,3,S,S]
        params: SamplingParams | None = None,
        *,
        sampling=None,
        temporal_encoding: bool = True,
    ) -> None:
        """Video input (reference multimodal/video.rs): sample frames,
        encode each through the vision tower, add temporal position
        codes, and lay the frames out as consecutive image spans."""
        import numpy as np_

        from ..multimodal.video import (
            FrameSampling,
            add_temporal_encoding,
            preprocess_video_frames,
        )

        if isinstance(frames, np_.ndarray) and frames.ndim == 4:
            batch = frames.astype(np_.float32)
        else:
            size = getattr(
                getattr(self.model, "vision", None), "image_size", None
            ) or getattr(self.model, "vision_image_size", 224)
            batch = preprocess_video_frames(
                list(frames), sampling or FrameSampling(), image_size=size
            )
        f = batch.shape[0]
        if f == 0:
            raise ValueError("video has no frames after sampling")
        per_frame = [
            self._encode_cached(batch[i], request_id) for i in range(f)
        ]
        embeds = jnp.stack(per_frame, axis=0)  # [F, T, H]
        if temporal_encoding:
            embeds = jnp.asarray(
                add_temporal_encoding(
                    np_.asarray(embeds, np_.float32)
                )
            )
        n = embeds.shape[1]
        # expand ONE video token into F x tokens_per_frame positions
        img_tok = self.model.image_token_index
        expanded: list[int] = []
        spans: list[tuple[int, int]] = []
        seen = 0
        for tok in prompt_ids:
            if tok == img_tok and seen == 0:
                for _ in range(f):
                    spans.append((len(expanded), n))
                    expanded.extend([img_tok] * n)
                seen = 1
            else:
                expanded.append(tok)
        if seen == 0:
            raise ValueError("prompt has no video placeholder token")
        if f * n > self.max_mm_tokens:
            raise ValueError(
                f"{f} frames x {n} tokens exceed the {self.max_mm_tokens}-"
                "token multimodal budget"
            )
        self._mm[request_id] = (embeds.reshape(f * n, -1), spans)
        self.add_request(request_id, expanded, params)
        if self._use_mrope and spans:
            # contiguous frame spans form ONE (f, g, g) temporal grid
            from ..multimodal.mrope import mrope_positions

            g = int(round(n ** 0.5))
            pos, delta = mrope_positions(
                len(expanded), [(spans[0][0], f * n)], [(f, g, g)]
            )
            seq = self.requests[request_id]
            seq.mrope_pos, seq.mrope_delta = pos, delta

    def _entry_bytes(self, e: jax.Array) -> int:
        return int(e.size) * e.dtype.itemsize

    def _encode_cached(
        self, img, request_id: str | None = None, jit_fn=None
    ) -> jax.Array:
        if isinstance(img, tuple):  # anyres: (pixel_values [P,3,S,S], size)
            pv, size = img
            key = hashlib.sha256(
                np.ascontiguousarray(pv).tobytes() + repr(tuple(size)).encode()
            ).hexdigest()
            e = self._encoder_cache.pop(key, None)
            if e is None:
                e = self.model.encode_anyres(
                    self.params, jnp.asarray(pv), tuple(size)
                )
                self._cache_used += self._entry_bytes(e)
            self._encoder_cache[key] = e
            if request_id is not None:
                self._cache_refs[key] = self._cache_refs.get(key, 0) + 1
                self._req_keys.setdefault(request_id, []).append(key)
            return e
        key = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()
        if jit_fn is not None:
            key = "aud:" + key
        e = self._encoder_cache.pop(key, None)
        if e is None:
            e = (jit_fn or self._encode_jit)(
                self.params, jnp.asarray(img)[None]
            )
            self._cache_used += self._entry_bytes(e)
            # LRU eviction under the byte budget, skipping referenced
            # entries (reference encoder_cache.rs refcounted free)
            for k in list(self._encoder_cache):
                if self._cache_used <= self.encoder_cache_bytes:
                    break
                if self._cache_refs.get(k, 0) > 0:
                    continue
                dead = self._encoder_cache.pop(k)
                self._cache_used -= self._entry_bytes(dead)
        self._encoder_cache[key] = e  # (re)insert at MRU position
        if request_id is not None:
            self._cache_refs[key] = self._cache_refs.get(key, 0) + 1
            self._req_keys.setdefault(request_id, []).append(key)
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
        for k in self._req_keys.pop(seq.request_id, []):
            left = self._cache_refs.get(k, 0) - 1
            if left <= 0:
                self._cache_refs.pop(k, None)
            else:
                self._cache_refs[k] = left

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
