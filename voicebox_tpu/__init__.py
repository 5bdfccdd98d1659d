"""voicebox_tpu — a TPU-native (JAX / XLA / Pallas) re-design of the
capabilities of lucidrains/voicebox-pytorch.

Public API mirrors the reference's 8-symbol surface
(reference __init__.py:1-15): Transformer, EncodecVoco, VoiceBox,
DurationPredictor, ConditionalFlowMatcherWrapper, VoiceBoxTrainer,
TextToSemantic, HubertWithKmeans.
"""

from .models.transformer import Transformer
from .models.voicebox import VoiceBox
from .models.cfm import ConditionalFlowMatcherWrapper

__version__ = "0.1.0"

__all__ = [
    "Transformer",
    "VoiceBox",
    "ConditionalFlowMatcherWrapper",
]


def __getattr__(name):
    # heavier subsystems are imported lazily so the core train/sample path
    # doesn't pay their import cost
    if name == "EncodecVoco":
        from .models.codec import EncodecVoco

        return EncodecVoco
    if name == "MelVoco":
        from .models.codec import MelVoco

        return MelVoco
    if name == "DurationPredictor":
        from .models.duration import DurationPredictor

        return DurationPredictor
    if name == "VoiceBoxTrainer":
        from .training.trainer import VoiceBoxTrainer

        return VoiceBoxTrainer
    if name == "TextToSemantic":
        from .models.text_to_semantic import TextToSemantic

        return TextToSemantic
    if name == "HubertWithKmeans":
        from .models.hubert import HubertWithKmeans

        return HubertWithKmeans
    # beyond-reference subsystems, exported for convenience
    if name == "TTSEngine":
        from .serving import TTSEngine

        return TTSEngine
    if name == "DynamicBatcher":
        from .serving import DynamicBatcher

        return DynamicBatcher
    if name == "TrainConfig":
        from .training.config import TrainConfig

        return TrainConfig
    if name == "MeshConfig":
        from .training.config import MeshConfig

        return MeshConfig
    if name == "PrefetchLoader":
        from .training.data import PrefetchLoader

        return PrefetchLoader
    if name == "TextToSemanticTrainer":
        from .training.seq2seq_trainer import TextToSemanticTrainer

        return TextToSemanticTrainer
    if name == "DurationPredictorTrainer":
        from .training.duration_trainer import DurationPredictorTrainer

        return DurationPredictorTrainer
    if name == "lora":
        from .ops import lora

        return lora
    raise AttributeError(f"module 'voicebox_tpu' has no attribute {name!r}")
