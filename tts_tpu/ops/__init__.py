from tts_tpu.ops.masking import sequence_mask

__all__ = ["sequence_mask"]
