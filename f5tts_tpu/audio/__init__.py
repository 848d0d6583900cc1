"""Host-side audio utilities: WAV I/O, reference preprocessing, crossfade stitching."""

from f5tts_tpu.audio.io import read_wav, write_wav, wav_bytes  # noqa: F401
from f5tts_tpu.audio.stitch import crossfade_concat  # noqa: F401
