"""Whisper encoder-decoder tests: HF transformers parity (encoder hidden
states, teacher-forced decoder logits) and end-to-end engine greedy
transcription equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from vllm_rust_tpu.engine.encdec import EncoderDecoderEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams

N_MELS = 8
D = 32


def tiny_whisper_dict():
    return dict(
        architectures=["WhisperForConditionalGeneration"],
        model_type="whisper",
        vocab_size=100,
        hidden_size=D,
        num_hidden_layers=2,
        num_attention_heads=4,
        d_model=D,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        num_mel_bins=N_MELS,
        max_source_positions=24,
        max_target_positions=32,
        decoder_start_token_id=90,
        eos_token_id=91,
    )


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    hf_cfg = WhisperConfig(
        vocab_size=100,
        d_model=D,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        num_mel_bins=N_MELS,
        max_source_positions=24,
        max_target_positions=32,
        decoder_start_token_id=90,
        eos_token_id=91,
        pad_token_id=0,
        bos_token_id=89,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()

    mc = ModelConfig.from_dict(tiny_whisper_dict())
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (k, v.detach().numpy()) for k, v in hf.state_dict().items()
    )
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(N_MELS, 48)).astype(np.float32)  # -> 24 enc pos
    return model, params, hf, torch, mel


def test_encoder_parity_vs_hf(hf_pair):
    model, params, hf, torch, mel = hf_pair
    with torch.no_grad():
        ref = hf.model.encoder(torch.tensor(mel[None])).last_hidden_state[0]
    got = np.asarray(model.encode_hidden(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref.numpy(), rtol=3e-4, atol=3e-4)


def test_decoder_teacher_forced_parity(hf_pair):
    model, params, hf, torch, mel = hf_pair
    dec_ids = [90, 5, 17, 42, 7]
    with torch.no_grad():
        ref = hf(
            input_features=torch.tensor(mel[None]),
            decoder_input_ids=torch.tensor([dec_ids]),
        ).logits[0].numpy()

    from vllm_rust_tpu.kv_cache.manager import KVCacheManager
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    kvm = KVCacheManager(CacheConfig(num_pages=8, page_size=16), model.kv_head_info)
    pools = kvm.create_device_pools(jnp.float32, num_slots=2)
    enc = model.encode(params, jnp.asarray(mel))
    for i, e in enumerate(enc):
        pools[i]["cross"] = pools[i]["cross"].at[0, : e.shape[0]].set(e)

    t = len(dec_ids)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(16, 16 + t, dtype=jnp.int32),
        kv_lens=jnp.asarray([t, 0], jnp.int32),
        page_indices=jnp.zeros((2, 2), jnp.int32).at[0, 0].set(1),
        cu_q_lens=jnp.asarray([0, t, t], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.asarray([t - 1, 0], jnp.int32),
        slot_ids=jnp.asarray([0, 1], jnp.int32),
    )
    hidden, _ = model(params, jnp.asarray(dec_ids, jnp.int32), md, pools)
    got = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def test_engine_greedy_matches_hf_generate(hf_pair):
    model, params, hf, torch, mel = hf_pair
    mc = ModelConfig.from_dict(tiny_whisper_dict())
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=16, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
        max_model_len=32,
        token_buckets=(8, 16, 32),
    )
    eng = EncoderDecoderEngine(model, params, cfg)
    n = 6
    eng.add_encoded_request(
        "a", mel, [90],
        SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    got = outs["a"].token_ids

    # HF manual greedy loop
    ids = [90]
    with torch.no_grad():
        feats = torch.tensor(mel[None])
        for _ in range(n):
            logits = hf(
                input_features=feats,
                decoder_input_ids=torch.tensor([ids]),
            ).logits[0, -1]
            ids.append(int(logits.argmax()))
    assert got == ids[1:], f"{got} vs {ids[1:]}"


def test_concurrent_transcriptions(hf_pair):
    """Two different audio clips decoded concurrently must match their
    solo runs (cross-KV slot isolation)."""
    model, params, hf, torch, mel = hf_pair
    rng = np.random.default_rng(7)
    mel2 = rng.normal(size=(N_MELS, 48)).astype(np.float32)

    def build():
        mc = ModelConfig.from_dict(tiny_whisper_dict())
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=16, page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
            max_model_len=32,
            token_buckets=(8, 16, 32),
        )
        return EncoderDecoderEngine(model, params, cfg)

    p = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    solo = {}
    for name, m in (("a", mel), ("b", mel2)):
        eng = build()
        eng.add_encoded_request(name, m, [90], p)
        while eng.has_unfinished:
            for o in eng.step():
                if o.finished:
                    solo[name] = o.token_ids

    eng = build()
    eng.add_encoded_request("a", mel, [90], p)
    eng.add_encoded_request("b", mel2, [90], p)
    both = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                both[o.request_id] = o.token_ids
    assert both == solo


def test_audio_endpoints_and_realtime(hf_pair):
    """Multipart /v1/audio/transcriptions + /v1/realtime WS subset."""
    import asyncio
    import base64
    import io
    import wave as wave_mod

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
    from vllm_rust_tpu.server.app import build_app
    from vllm_rust_tpu.tokenizer import MockTokenizer

    model, params, hf, torch, mel = hf_pair

    def wav_bytes():
        rng = np.random.default_rng(3)
        pcm = (rng.normal(size=8000) * 3000).astype(np.int16)
        bio = io.BytesIO()
        with wave_mod.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        return bio.getvalue(), pcm

    async def main():
        mc = ModelConfig.from_dict(tiny_whisper_dict())
        # full-length mel (3000 frames) exceeds the tiny enc positions;
        # widen the test model's encoder positions for real audio input
        mc.extra["max_source_positions"] = 1500
        mdl = from_config(mc, dtype=jnp.float32)
        prms = mdl.init_params(jax.random.PRNGKey(0))
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=16, page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
            max_model_len=32,
            token_buckets=(8, 16, 32),
        )
        eng = EncoderDecoderEngine(mdl, prms, cfg, tokenizer=MockTokenizer())
        aeng = AsyncLLMEngine(eng)
        app = build_app(aeng, MockTokenizer(), model_name="tiny-whisper")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            data, pcm = wav_bytes()
            form = aiohttp.FormData()
            form.add_field("file", data, filename="a.wav",
                           content_type="audio/wav")
            form.add_field("response_format", "json")
            r = await client.post("/v1/audio/transcriptions", data=form)
            assert r.status == 200, await r.text()
            body = await r.json()
            assert isinstance(body["text"], str) and body["text"]

            # realtime WS
            ws = await client.ws_connect("/v1/realtime")
            ev = await ws.receive_json()
            assert ev["type"] == "session.created"
            await ws.send_json({
                "type": "input_audio_buffer.append",
                "audio": base64.b64encode(pcm.tobytes()).decode(),
            })
            await ws.send_json({"type": "input_audio_buffer.commit",
                                "final": True})
            deltas, done = [], None
            while True:
                ev = await ws.receive_json()
                if ev["type"] == "transcription.delta":
                    deltas.append(ev["delta"])
                elif ev["type"] == "transcription.done":
                    done = ev["text"]
                    break
            assert done == "".join(deltas)
            await ws.close()
        finally:
            await client.close()
            aeng.shutdown()

    asyncio.run(main())


def test_mel_spectrogram_matches_hf():
    pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor

    from vllm_rust_tpu.multimodal.audio import log_mel_spectrogram

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = rng.normal(size=24000).astype(np.float32) * 0.1
    ref = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    got = log_mel_spectrogram(audio, n_mels=80)
    np.testing.assert_allclose(got, ref, atol=3e-6)


def test_wav_decode_roundtrip():
    import io
    import wave as wave_mod

    from vllm_rust_tpu.multimodal.audio import decode_audio, decode_wav

    pcm = (np.sin(np.linspace(0, 100, 1600)) * 20000).astype(np.int16)
    bio = io.BytesIO()
    with wave_mod.open(bio, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.stack([pcm, pcm], 1).tobytes())
    out = decode_wav(bio.getvalue())
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-4)
    # container sniffing: non-RIFF rejected with a clear error
    with pytest.raises(ValueError, match="unsupported audio container"):
        decode_audio(b"\x00\x01\x02\x03garbage")
