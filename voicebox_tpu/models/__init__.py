from .primitives import (
    AdaptiveRMSNorm,
    ConvPositionEmbed,
    FeedForward,
    GEGLU,
    LearnedSinusoidalPosEmb,
    MultiheadRMSNorm,
    RMSNorm,
    SimpleGateLoopLayer,
)
from .attention import Attention
from .transformer import Transformer
from .voicebox import VoiceBox
from .cfm import ConditionalFlowMatcherWrapper
from .codec import AudioEncoderDecoder, EncodecVoco, MelVoco
from .duration import Aligner, DurationPredictor
from .encodec import EncodecModel
from .vocos import Vocos
