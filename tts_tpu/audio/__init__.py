from tts_tpu.audio.processor import AudioProcessor
from tts_tpu.audio import dsp, mel

__all__ = ["AudioProcessor", "dsp", "mel"]
