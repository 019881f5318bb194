"""Native JAX model families (SURVEY.md §2.5 product surface).

Silero-style VAD, SenseVoice-style ASR, Supertonic-style TTS, YOLO26-style
detection/segmentation. ONNX checkpoints of the real models compile through
``lele_tpu.compiler``; these native architectures run the same pipelines
without downloads (bench, tests, sharding, fine-tuning).
"""

from .sensevoice import (  # noqa: F401
    SenseVoiceConfig,
    SenseVoiceModel,
    greedy_ctc_decode,
    init_sensevoice,
    sensevoice_encode,
)
from .silero import (  # noqa: F401
    SileroConfig,
    SileroVad,
    VadSegmentConfig,
    collect_segments,
    silero_step,
    zero_state,
)
from .supertonic import (  # noqa: F401
    AVAILABLE_LANGS,
    SupertonicConfig,
    SupertonicTts,
    UnicodeIndexer,
    chunk_text,
    is_valid_lang,
    load_voice_style,
    normalize_text,
    prepare_chunks,
)
from .sensevoice import (  # noqa: F401
    prepare_quantized_params,
    prepare_w8_params,
    stack_layer_params,
)
from .sensevoice_stream import (  # noqa: F401
    StreamConfig,
    StreamingSenseVoice,
    init_stream_state,
    stream_step,
)
from .yolo26 import (  # noqa: F401
    Yolo26Config,
    Yolo26Model,
    compose_masks,
    decode_detections,
)
