from tts_tpu.data.formatters import load_meta_data, get_formatter_by_name
from tts_tpu.data.tts_dataset import TTSDataset
from tts_tpu.data.sampler import shard_indices

__all__ = ["load_meta_data", "get_formatter_by_name", "TTSDataset", "shard_indices"]
