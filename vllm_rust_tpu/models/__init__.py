"""Model registry.

Reference: crates/core/src/models/registry.rs (phf arch map) +
models/factory.rs ArchFactory/Capabilities. Here the registry is a plain
dict keyed on HF ``architectures[0]`` with lazy constructors; capability
flags live on the model classes themselves.
"""

from __future__ import annotations

from typing import Callable

from ..config import ModelConfig

_REGISTRY: dict[str, Callable] = {}


def register_model(*arch_names: str):
    def deco(cls):
        for n in arch_names:
            _REGISTRY[n] = cls
        return cls

    return deco


def _populate():
    if _REGISTRY:
        return
    from .llama import (
        LlamaForCausalLM,
        MistralForCausalLM,
        Qwen2ForCausalLM,
        Qwen3ForCausalLM,
    )

    from .gritlm import GritLMForCausalLM

    _REGISTRY.update(
        {
            "LlamaForCausalLM": LlamaForCausalLM,
            "MistralForCausalLM": MistralForCausalLM,
            "Qwen2ForCausalLM": Qwen2ForCausalLM,
            "Qwen3ForCausalLM": Qwen3ForCausalLM,
            # dual generative/embedding Llama (reference registry.rs:812,
            # models/gritlm.rs)
            "GritLM": GritLMForCausalLM,
        }
    )
    try:
        from .gemma import (
            GemmaForCausalLM,
            Gemma2ForCausalLM,
            Gemma3ForCausalLM,
        )

        _REGISTRY.update(
            {
                "GemmaForCausalLM": GemmaForCausalLM,
                "Gemma2ForCausalLM": Gemma2ForCausalLM,
                "Gemma3ForCausalLM": Gemma3ForCausalLM,
                "Gemma3ForConditionalGeneration": Gemma3ForCausalLM,
            }
        )
    except ImportError:
        pass
    try:
        from .phi import GPT2LMHeadModel, JAISLMHeadModel, Phi3ForCausalLM

        _REGISTRY.update(
            {
                "Phi3ForCausalLM": Phi3ForCausalLM,
                "Phi4ForCausalLM": Phi3ForCausalLM,
                "GPT2LMHeadModel": GPT2LMHeadModel,
                "JAISLMHeadModel": JAISLMHeadModel,
                "Jais2ForCausalLM": JAISLMHeadModel,
            }
        )
    except ImportError:
        pass
    try:
        from .misc_archs import register_misc

        register_misc(_REGISTRY)
    except ImportError:
        pass
    try:
        from .breadth import register_breadth

        register_breadth(_REGISTRY)
    except ImportError:
        pass
    try:
        from .deepseek import DeepseekV2ForCausalLM, DeepseekV3ForCausalLM

        _REGISTRY["DeepseekV2ForCausalLM"] = DeepseekV2ForCausalLM
        _REGISTRY["DeepseekV3ForCausalLM"] = DeepseekV3ForCausalLM
    except ImportError:
        pass
    try:
        from .llava import LlavaForConditionalGeneration

        _REGISTRY["LlavaForConditionalGeneration"] = LlavaForConditionalGeneration
        from .vlm_breadth import register_vlm_breadth

        register_vlm_breadth(_REGISTRY)

        def _gemma3_cond(config, **kw):
            """Gemma3ForConditionalGeneration is multimodal when the HF
            config carries a vision_config; small text-only checkpoints
            reuse the same arch string."""
            if "vision_config" in config.extra:
                from .vlm_breadth import Gemma3MMForConditionalGeneration

                return Gemma3MMForConditionalGeneration(config, **kw)
            from .gemma import Gemma3ForCausalLM

            return Gemma3ForCausalLM(config, **kw)

        _REGISTRY["Gemma3ForConditionalGeneration"] = _gemma3_cond
        from .audio_lmm import register_audio_lmm

        register_audio_lmm(_REGISTRY)
        from .vlm_breadth2 import register_vlm_breadth2

        register_vlm_breadth2(_REGISTRY)
    except ImportError:
        pass
    try:
        from .whisper import WhisperForConditionalGeneration

        _REGISTRY["WhisperForConditionalGeneration"] = (
            WhisperForConditionalGeneration
        )
    except ImportError:
        pass
    try:
        from .t5 import T5ForConditionalGeneration

        _REGISTRY["T5ForConditionalGeneration"] = T5ForConditionalGeneration
        _REGISTRY["MT5ForConditionalGeneration"] = T5ForConditionalGeneration
    except ImportError:
        pass
    try:
        from .bert import (
            BertForSequenceClassification,
            BertModel,
            RobertaForSequenceClassification,
            RobertaModel,
        )

        _REGISTRY.update(
            {
                "BertModel": BertModel,
                "BertForMaskedLM": BertModel,
                "BertForSequenceClassification": BertForSequenceClassification,
                "RobertaModel": RobertaModel,
                "RobertaForMaskedLM": RobertaModel,
                "RobertaForSequenceClassification": RobertaForSequenceClassification,
                "XLMRobertaModel": RobertaModel,
                "XLMRobertaForSequenceClassification": RobertaForSequenceClassification,
            }
        )
    except ImportError:
        pass
    try:
        from .mamba import (
            FalconMambaForCausalLM,
            JambaForCausalLM,
            Mamba2ForCausalLM,
            MambaForCausalLM,
        )

        _REGISTRY.update(
            {
                "MambaForCausalLM": MambaForCausalLM,
                "Mamba2ForCausalLM": Mamba2ForCausalLM,
                "FalconMambaForCausalLM": FalconMambaForCausalLM,
                "JambaForCausalLM": JambaForCausalLM,
            }
        )
        from .hybrid_ssm import register_hybrid_ssm

        register_hybrid_ssm(_REGISTRY)
    except ImportError:
        pass
    try:
        from .gpt_family import (
            BloomForCausalLM,
            FalconForCausalLM,
            GPTBigCodeForCausalLM,
            GPTJForCausalLM,
            GPTNeoXForCausalLM,
            MPTForCausalLM,
            NemotronForCausalLM,
            OPTForCausalLM,
            PersimmonForCausalLM,
            PhiForCausalLM,
            StablelmForCausalLM,
            Starcoder2ForCausalLM,
        )

        _REGISTRY.update(
            {
                "GPTNeoXForCausalLM": GPTNeoXForCausalLM,
                "GPTJForCausalLM": GPTJForCausalLM,
                "OPTForCausalLM": OPTForCausalLM,
                "BloomForCausalLM": BloomForCausalLM,
                "MPTForCausalLM": MPTForCausalLM,
                "MptForCausalLM": MPTForCausalLM,
                "FalconForCausalLM": FalconForCausalLM,
                "RWForCausalLM": FalconForCausalLM,
                "GPTBigCodeForCausalLM": GPTBigCodeForCausalLM,
                "Starcoder2ForCausalLM": Starcoder2ForCausalLM,
                "PersimmonForCausalLM": PersimmonForCausalLM,
                "PhiForCausalLM": PhiForCausalLM,
                "StablelmForCausalLM": StablelmForCausalLM,
                "StableLmForCausalLM": StablelmForCausalLM,
                "StableLMEpochForCausalLM": StablelmForCausalLM,
                "NemotronForCausalLM": NemotronForCausalLM,
            }
        )
    except ImportError:
        pass
    try:
        from .qwen3_moe import (
            MixtralForCausalLM,
            Qwen2MoeForCausalLM,
            Qwen3MoeForCausalLM,
        )

        from .gpt_oss import GptOssForCausalLM

        _REGISTRY["GptOssForCausalLM"] = GptOssForCausalLM
        from .moe_breadth import register_moe_breadth

        register_moe_breadth(_REGISTRY)
        from .moe_breadth2 import register_moe_breadth2

        register_moe_breadth2(_REGISTRY)
        _REGISTRY["Qwen3MoeForCausalLM"] = Qwen3MoeForCausalLM
        _REGISTRY["Qwen2MoeForCausalLM"] = Qwen2MoeForCausalLM
        _REGISTRY["MixtralForCausalLM"] = MixtralForCausalLM
        from .qwen3_next import Qwen3NextForCausalLM

        _REGISTRY["Qwen3NextForCausalLM"] = Qwen3NextForCausalLM
        from .minimax_text01 import MiniMaxText01ForCausalLM

        _REGISTRY["MiniMaxText01ForCausalLM"] = MiniMaxText01ForCausalLM
        _REGISTRY["MiniMaxForCausalLM"] = MiniMaxText01ForCausalLM
        _REGISTRY["MiniMaxM1ForCausalLM"] = MiniMaxText01ForCausalLM
        from .kimi_linear import KimiLinearForCausalLM

        _REGISTRY["KimiLinearForCausalLM"] = KimiLinearForCausalLM
        from .breadth3 import register_breadth3

        register_breadth3(_REGISTRY)
        from .breadth4 import register_breadth4

        register_breadth4(_REGISTRY)
        from .reward import register_reward

        register_reward(_REGISTRY)
        from .breadth5 import register_breadth5

        register_breadth5(_REGISTRY)
        from .gemma3n import register_gemma3n

        register_gemma3n(_REGISTRY)
        from .breadth6 import register_breadth6

        register_breadth6(_REGISTRY)
        from .encoder_breadth import register_encoder_breadth

        register_encoder_breadth(_REGISTRY)
        from .vlm_breadth3 import register_vlm_breadth3

        register_vlm_breadth3(_REGISTRY)
        from .vlm_breadth4 import register_vlm_breadth4

        register_vlm_breadth4(_REGISTRY)
        from .audio_lmm2 import register_audio_lmm2

        register_audio_lmm2(_REGISTRY)
        from .vlm_breadth5 import register_vlm_breadth5

        register_vlm_breadth5(_REGISTRY)
        from .vlm_breadth6 import register_vlm_breadth6

        register_vlm_breadth6(_REGISTRY)
        from .gemma4 import register_gemma4

        register_gemma4(_REGISTRY)
        from .vlm_breadth7 import register_vlm_breadth7

        register_vlm_breadth7(_REGISTRY)
        from .audio_lmm3 import register_audio_lmm3

        register_audio_lmm3(_REGISTRY)
        from .nemotron_parse import NemotronParseForConditionalGeneration

        _REGISTRY["NemotronParseForConditionalGeneration"] = (
            NemotronParseForConditionalGeneration
        )
    except ImportError:
        pass
    _register_aliases()


# speculator checkpoint architectures -> proposer class + target-arch hint
# (reference models/factories eagle*/medusa/mtp files + Capabilities::
# SPECULATIVE_DRAFT). These are draft MODULES, not standalone LMs: the
# spec-decode engine attaches them to a target model (spec_decode/*.py).
SPECULATOR_ARCHS: dict[str, str] = {
    "EAGLEForCausalLM": "eagle",
    "EagleLlamaForCausalLM": "eagle",
    "EagleMiniCPMForCausalLM": "eagle",
    "Eagle3LlamaForCausalLM": "eagle3",
    "LlamaForCausalLMEagle3": "eagle3",
    "EagleLlama4ForCausalLM": "eagle",
    "EagleDeepSeekMTPModel": "mtp",
    "DeepSeekMTPModel": "mtp",
    "Glm4MoeMTPModel": "mtp",
    "MiMoMTPModel": "mtp",
    "ErnieMTPModel": "mtp",
    "Qwen3NextMTP": "mtp",
    "LongCatFlashMTPModel": "mtp",
    "MedusaModel": "medusa",
    "MedusaModelHead": "medusa",
    "MLPSpeculatorPreTrainedModel": "mlp_speculator",
    # per-target EAGLE/MTP checkpoint arch strings (reference
    # factories/eagle3_llama.rs, eagle_deep_seek_mtp_model.rs,
    # eagle_mistral_large3.rs, exaone_moe_mtp.rs, step3p5_mtp.rs,
    # glm4_moe_mtp_model.rs, glm_ocr_mtp_model.rs, open_pangu_mtp_model.rs)
    "Eagle3Qwen2_5vlForCausalLM": "eagle3",
    "Eagle3Qwen3vlForCausalLM": "eagle3",
    "EagleDeepseekV3ForCausalLM": "eagle",
    "EagleMistralLarge3ForCausalLM": "eagle",
    "Eagle3MistralLarge3ForCausalLM": "eagle3",
    "ExaoneMoeMTP": "mtp",
    "Step3p5MTP": "mtp",
    "Glm4MoeLiteMTPModel": "mtp",
    "GlmOcrMTPModel": "mtp",
    "OpenPanguMTPModel": "mtp",
}


def speculator_kind(arch: str) -> str | None:
    """Classify a checkpoint architecture as a speculator draft module
    (returns the proposer kind) or None for ordinary models."""
    return SPECULATOR_ARCHS.get(arch)


# Architectures the reference registers by name but ships no runnable
# implementation for (registry.rs:1064 Terratorch entry is registry-only);
# recognized here with an explicit error instead of the generic unknown-
# architecture message.
_KNOWN_UNSUPPORTED = {
    "PrithviGeoSpatialMAE": (
        "geospatial masked-autoencoder checkpoints (Terratorch) are "
        "registry-recognized but have no serving implementation "
        "(reference registry.rs:1064 — registry-only there as well)"
    ),
    "Terratorch": (
        "Terratorch geospatial models are registry-recognized but have "
        "no serving implementation (reference registry.rs:1064 — "
        "registry-only there as well)"
    ),
}


def _register_aliases():
    """Checkpoint families the reference registry itself groups under one
    implementation (registry.rs ArchitectureInfo arch_names lists)."""
    alias_to_target = {
        # DeepSeek V1 dense is the Llama architecture; V3.2 loads V3
        # weights (the DSA top-k indexer prunes attention — running the
        # dense MLA superset is the documented round-1 fallback)
        "DeepseekForCausalLM": "LlamaForCausalLM",
        "DeepseekV32ForCausalLM": "DeepseekV3ForCausalLM",
        "MantisForConditionalGeneration": "LlavaNextForConditionalGeneration",
        "TarsierForConditionalGeneration": "LlavaForConditionalGeneration",
        "Tarsier2ForConditionalGeneration": "Qwen2VLForConditionalGeneration",
        "GrokForCausalLM": "Grok1ForCausalLM",
        "Grok2ForCausalLM": "Grok1ForCausalLM",
        "MistralLarge3ForCausalLM": "MistralForCausalLM",
        "BgeM3EmbeddingModel": "XLMRobertaModel",
        "BgeRerankerModel": "XLMRobertaForSequenceClassification",
        "GteModel": "BertModel",
        "Qwen25VLForConditionalGeneration": "Qwen2_5_VLForConditionalGeneration",
        "T5Model": "T5ForConditionalGeneration",
        "PhiMoeForCausalLM": "PhiMoEForCausalLM",
        "Ernie45MoeForCausalLM": "Ernie4_5_MoeForCausalLM",
        "Ernie4_5MoeForCausalLM": "Ernie4_5_MoeForCausalLM",
        # Nemotron-NAS checkpoints are DeciLM variable-GQA models
        "NemotronNasForCausalLM": "DeciLMForCausalLM",
        # weight-identical llama forks (reference factories/llama.rs
        # LLAMA_ARCH_NAMES)
        "TeleChatForCausalLM": "LlamaForCausalLM",
        "TeleChat2ForCausalLM": "LlamaForCausalLM",
        "IQuestCoderForCausalLM": "LlamaForCausalLM",
        # reference registry groups classification aliases with the LM
        # factory (registry.rs:142, :418)
        "GPT2ForSequenceClassification": "GPT2LMHeadModel",
        "JambaForSequenceClassification": "JambaForCausalLM",
        # LLaVA-OneVision group (registry.rs:915-921)
        "LlavaNextVideoForConditionalGeneration":
            "LlavaOnevisionForConditionalGeneration",
        "RForConditionalGeneration":
            "LlavaOnevisionForConditionalGeneration",
        "BeeForConditionalGeneration":
            "LlavaOnevisionForConditionalGeneration",
        # reference-grouped VLM/encoder aliases (registry.rs
        # ArchitectureInfo arch_names lists)
        "BertForTokenClassification": "BertModel",
        "HF_ColBERT": "ColBERTModel",
        "H2OVLChatModel": "InternVLChatModel",
        "SkyworkR1VChatModel": "InternVLChatModel",
        # NVLM-D is the InternVL architecture family (registry.rs:182)
        "NVLM_D_Model": "InternVLChatModel",
        "NVLM_D": "InternVLChatModel",
        "Llama4VLForConditionalGeneration": "Llama4ForConditionalGeneration",
        "MLlama4ForConditionalGeneration": "Llama4ForConditionalGeneration",
        "ModernBertForTokenClassification": "ModernBertModel",
        "MiniCPMVForConditionalGeneration": "MiniCPMV",
        "OpenCUAForConditionalGeneration":
            "Qwen2_5_VLForConditionalGeneration",
        "VoxtralRealtimeGeneration": "VoxtralForConditionalGeneration",
        "InternS1ForConditionalGeneration":
            "InternVLForConditionalGeneration",
        # LightOnOCR ships the Mistral3/Pixtral factory
        # (factories/light_on_ocr.rs new_lighton)
        "LightOnOCRForConditionalGeneration":
            "Mistral3ForConditionalGeneration",
        # *ForEmbedding aliases the reference registers next to the base
        # embedding models (factories/e5_mistral.rs, gte_new.rs,
        # modern_bert.rs, voyage.rs)
        "E5MistralForEmbedding": "E5MistralModel",
        "GteNewForEmbedding": "GteNewModel",
        "ModernBertForEmbedding": "ModernBertModel",
        "VoyageForEmbedding": "VoyageQwen3BidirectionalEmbedModel",
    }
    for alias, target in alias_to_target.items():
        if target in _REGISTRY and alias not in _REGISTRY:
            _REGISTRY[alias] = _REGISTRY[target]


def supported_architectures() -> list[str]:
    _populate()
    return sorted(set(_REGISTRY) | set(SPECULATOR_ARCHS))


def from_config(config: ModelConfig, **kwargs):
    """Instantiate a model for an HF config (reference models/mod.rs:564
    from_config dispatch)."""
    _populate()
    for arch in config.architectures:
        if arch in _REGISTRY:
            return _REGISTRY[arch](config, **kwargs)
    for arch in config.architectures:
        kind = speculator_kind(arch)
        if kind:
            raise ValueError(
                f"{arch} is a speculative-decoding draft module "
                f"(kind={kind!r}); pass it as the draft/speculator model "
                "of a target engine (spec_decode), not as a standalone LM"
            )
        if arch in _KNOWN_UNSUPPORTED:
            raise ValueError(f"{arch}: {_KNOWN_UNSUPPORTED[arch]}")
    raise ValueError(
        f"unsupported architecture(s) {config.architectures}; "
        f"supported: {supported_architectures()}"
    )
