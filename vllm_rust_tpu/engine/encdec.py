"""Encoder-decoder engine: Whisper-style speech-to-text serving.

Reference: crates/core/src/engine/encoder_decoder.rs + the audio API
path (api/audio.rs). The audio encoder runs once per request (one jitted
call); its per-layer cross K/V land in slot-indexed device buffers when
the sequence gets its slot; the decoder then flows through the ordinary
synchronous continuous-batching step (a zero-draft speculative step —
same packed dispatch, same sampler, same stop handling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..request import RequestOutput, SamplingParams, Sequence
from ..spec_decode.engine import SpecLLMEngine


class _NullProposer:
    """Zero-width proposer: turns the speculative engine into a plain
    synchronous engine (every step scores exactly one token)."""

    max_draft_tokens = 0

    def propose(self, seq):
        return []

    def on_tokens_verified(self, seq, accepted):
        pass

    def on_preempt(self, seq):
        pass

    def on_request_complete(self, seq):
        pass


class EncoderDecoderEngine(SpecLLMEngine):
    def __init__(self, model, params, config: EngineConfig, tokenizer=None):
        assert getattr(model, "is_encoder_decoder", False)
        super().__init__(
            model, params, config, tokenizer, proposer=_NullProposer()
        )
        self._encode_jit = jax.jit(model.encode)
        self._enc_kv: dict[str, list[jax.Array]] = {}

    # -- encoder side -----------------------------------------------------------

    def add_encoded_request(
        self,
        request_id: str,
        features: np.ndarray,  # [n_mels, frames] log-mel features
        prompt_ids: list[int],
        params: SamplingParams | None = None,
    ) -> None:
        """Encode the audio and admit the decoder sequence."""
        enc = self._encode_jit(self.params, jnp.asarray(features))
        self._enc_kv[request_id] = enc
        self.add_request(request_id, prompt_ids, params)

    def _assign_slot(self, seq: Sequence) -> None:
        super()._assign_slot(seq)
        enc = self._enc_kv.get(seq.request_id)
        if enc is not None:
            for i, e in enumerate(enc):
                st = self.kv_pages[i]
                st["cross"] = st["cross"].at[seq.slot, : e.shape[0]].set(
                    e.astype(st["cross"].dtype)
                )
                st["enc_len"] = st["enc_len"].at[seq.slot].set(e.shape[0])

    def _finish(self, seq, reason, stop_reason=None) -> None:
        super()._finish(seq, reason, stop_reason)
        self._enc_kv.pop(seq.request_id, None)

    # -- convenience -------------------------------------------------------------

    def decoder_prompt(
        self, language: str | None = None, task: str = "transcribe"
    ) -> list[int]:
        """<|startoftranscript|>[<|lang|>][<|task|>]<|notimestamps|>
        built from config/tokenizer (reference api/audio.rs prompt)."""
        ex = self.config.model.extra
        ids = [int(ex.get("decoder_start_token_id", 50258))]
        tok = self.tokenizer
        if tok is not None and language:
            lang_id = _token_id(tok, f"<|{language}|>")
            if lang_id is not None:
                ids.append(lang_id)
                task_id = _token_id(tok, f"<|{task}|>")
                if task_id is not None:
                    ids.append(task_id)
        if tok is not None:
            nt = _token_id(tok, "<|notimestamps|>")
            if nt is not None:
                ids.append(nt)
        return ids

    def transcribe(
        self,
        audio: np.ndarray | bytes,
        *,
        language: str | None = None,
        task: str = "transcribe",
        prompt_ids: list[int] | None = None,
        params: SamplingParams | None = None,
        timeout_s: float = 600.0,
    ) -> RequestOutput:
        """One-shot transcription (reference /v1/audio/transcriptions)."""
        import time

        from ..multimodal.audio import decode_audio, log_mel_spectrogram

        if isinstance(audio, (bytes, bytearray)):
            audio = decode_audio(bytes(audio))
        features = log_mel_spectrogram(np.asarray(audio), n_mels=self.model.n_mels)
        if prompt_ids is None:
            prompt_ids = self.decoder_prompt(language, task)
        if params is None:
            params = SamplingParams(
                max_tokens=self.model.dec_positions - len(prompt_ids) - 1,
                temperature=0.0,
            )
        rid = f"audio-{self._step_count}-{len(self.requests)}"
        self.add_encoded_request(rid, features, prompt_ids, params)
        deadline = time.monotonic() + timeout_s
        final = None
        while self.has_unfinished:
            if time.monotonic() > deadline:
                raise TimeoutError("transcribe() exceeded timeout")
            for out in self.step():
                if out.request_id == rid and out.finished:
                    final = out
        assert final is not None
        return final


def _token_id(tok, text: str) -> int | None:
    try:
        ids = tok.encode(text, add_special_tokens=False)
    except TypeError:
        ids = tok.encode(text)
    return ids[0] if len(ids) == 1 else None
