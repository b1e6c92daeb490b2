"""Vision tower + LLaVA multimodal tests: HF parity for CLIP/SigLIP
encoders and the image preprocessor; engine-level embedding injection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tower_pair(kind):
    from vllm_rust_tpu.models.vision import CLIPVisionTower, SiglipVisionTower

    if kind == "clip":
        from transformers import CLIPVisionConfig as C, CLIPVisionModel as M

        tower_cls = CLIPVisionTower
    else:
        from transformers import SiglipVisionConfig as C, SiglipVisionModel as M

        tower_cls = SiglipVisionTower
    cfg = C(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = M(cfg).eval()
    tower = tower_cls(cfg.to_dict(), dtype=jnp.float32)
    params = tower.load_weights(
        (k, v.numpy()) for k, v in hf.state_dict().items()
    )
    return tower, params, hf


@pytest.mark.parametrize("kind", ["clip", "siglip"])
def test_vision_tower_parity(kind):
    tower, params, hf = _tower_pair(kind)
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(tower(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
    # llava's feature layer (-2), pre-post-layernorm
    with torch.no_grad():
        ref2 = hf(
            torch.tensor(px), output_hidden_states=True
        ).hidden_states[-2].numpy()
    got2 = np.asarray(tower(params, jnp.asarray(px), feature_layer=-2))
    np.testing.assert_allclose(got2, ref2, rtol=3e-4, atol=3e-4)


def test_image_preprocessor_matches_hf():
    from transformers import CLIPImageProcessor

    from vllm_rust_tpu.multimodal.image import preprocess_image

    proc = CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28}
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    ref = proc(img, return_tensors="np").pixel_values[0]
    got = preprocess_image(img, size=28, crop=28)
    assert got.shape == ref.shape == (3, 28, 28)
    np.testing.assert_allclose(got, ref, atol=2e-2)  # resamplers differ slightly


# -- LLaVA ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def llava_pair():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    from vllm_rust_tpu.config import ModelConfig
    from vllm_rust_tpu.models import from_config

    vis = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        attention_dropout=0.0,
    )
    txt = LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attention_dropout=0.0,
    )
    hf_cfg = LlavaConfig(
        vision_config=vis, text_config=txt, image_token_index=120,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()

    mc = ModelConfig.from_dict(
        dict(
            architectures=["LlavaForConditionalGeneration"],
            model_type="llava",
            vocab_size=128,
            hidden_size=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            eos_token_id=2,
            image_token_index=120,
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
            text_config=dict(
                architectures=["LlamaForCausalLM"], vocab_size=128,
                hidden_size=48, intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, rms_norm_eps=1e-6,
            ),
            vision_config=dict(
                model_type="clip_vision_model", hidden_size=32,
                intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=28, patch_size=14,
                hidden_act="quick_gelu",
            ),
        )
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (k, v.numpy()) for k, v in hf.state_dict().items()
    )
    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    return model, params, hf, mc, px


def test_llava_image_features_parity(llava_pair):
    model, params, hf, mc, px = llava_pair
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px), vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = np.asarray(model.encode_images(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
    assert got.shape[0] == model.tokens_per_image == 4


def test_llava_engine_greedy_matches_hf(llava_pair):
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine.vlm import VlmEngine
    from vllm_rust_tpu.request import SamplingParams

    model, params, hf, mc, px = llava_pair
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=16, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
        max_model_len=64,
        token_buckets=(16, 32),
    )
    eng = VlmEngine(model, params, cfg)
    # prompt with ONE un-expanded image token (the engine expands it)
    prompt = [1, 5, 120, 7, 9]
    n = 6
    eng.add_image_request(
        "a", prompt, [px[0]],
        SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    got = outs["a"].token_ids

    # HF greedy: expanded ids (image token repeated tokens_per_image times)
    ids = [1, 5] + [120] * model.tokens_per_image + [7, 9]
    with torch.no_grad():
        feats = torch.tensor(px)
        for _ in range(n):
            logits = hf(
                input_ids=torch.tensor([ids]), pixel_values=feats
            ).logits[0, -1]
            ids.append(int(logits.argmax()))
    assert got == ids[-n:], f"{got} vs {ids[-n:]}"


def test_llava_chunked_prefill_across_image_span(llava_pair):
    """Image span split across prefill chunks must still inject correctly."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine.vlm import VlmEngine
    from vllm_rust_tpu.request import SamplingParams

    model, params, hf, mc, px = llava_pair

    def run(chunk):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=16, page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=chunk),
            max_model_len=64,
            token_buckets=(4, 8, 16, 32),
        )
        eng = VlmEngine(model, params, cfg)
        prompt = [1, 5, 120, 7, 9, 11, 3]
        eng.add_image_request(
            "a", prompt, [px[0]],
            SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True),
        )
        outs = {}
        while eng.has_unfinished:
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o
        return outs["a"].token_ids

    assert run(32) == run(4)  # 4-token chunks split the image span


def test_vlm_chat_endpoint(llava_pair):
    """/v1/chat/completions with a base64 data-URL image part."""
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine.async_engine import AsyncLLMEngine
    from vllm_rust_tpu.engine.vlm import VlmEngine
    from vllm_rust_tpu.server.app import build_app
    from vllm_rust_tpu.tokenizer import MockTokenizer

    model, params, hf, mc, px = llava_pair

    class VlmMockTokenizer(MockTokenizer):
        def encode(self, text, add_special_tokens=True):
            out = []
            for piece in text.replace("<image>", " <image> ").split():
                if piece == "<image>":
                    out.append(120)
                else:
                    out.extend(super().encode(piece))
            return out

    def png_data_url():
        from PIL import Image

        rng = np.random.default_rng(0)
        img = Image.fromarray(
            rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        )
        bio = io.BytesIO()
        img.save(bio, format="PNG")
        return "data:image/png;base64," + base64.b64encode(
            bio.getvalue()
        ).decode()

    async def main():
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=16, page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
            max_model_len=64,
            token_buckets=(16, 32),
        )
        tok = VlmMockTokenizer()
        eng = VlmEngine(model, params, cfg, tokenizer=tok)
        aeng = AsyncLLMEngine(eng)
        app = build_app(aeng, tok, model_name="tiny-llava")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "m",
                    "messages": [
                        {
                            "role": "user",
                            "content": [
                                {"type": "text", "text": "what is this"},
                                {"type": "image_url",
                                 "image_url": {"url": png_data_url()}},
                            ],
                        }
                    ],
                    "max_tokens": 5,
                },
            )
            assert r.status == 200, await r.text()
            data = await r.json()
            assert data["choices"][0]["message"]["content"]
        finally:
            await client.close()
            aeng.shutdown()

    asyncio.run(main())
