from tts_tpu.export.deploy import (
    export_saved_model, export_tflite, load_tflite, max_abs_diff,
    run_tflite,
)

__all__ = ["export_saved_model", "export_tflite", "load_tflite",
           "max_abs_diff", "run_tflite"]
