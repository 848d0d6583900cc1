"""Text front-end: vocab/char tokenizer, pinyin pass-through, chunking."""

from f5tts_tpu.text.tokenizer import Tokenizer, convert_char_to_pinyin  # noqa: F401
from f5tts_tpu.text.chunker import chunk_text  # noqa: F401
