"""Edge deployment: jax2tf -> SavedModel / TFLite with parity checking.

The equivalent capability of the reference's hand-written TF2 twin +
torch->TF weight conversion + TFLite export
(/root/reference/TTS/tts/tf/, /root/reference/TTS/vocoder/tf/,
convert_torch_to_tf_utils.py:26-45, tflite.py:4-26): here the SAME jitted
JAX inference function is staged to TF with a fixed input signature —
no second implementation to keep in sync; the parity check is the
``max_abs_diff`` harness (≙ compare_torch_tf).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np


def export_saved_model(fn: Callable, example_args: Sequence[Any],
                       out_dir: str) -> None:
    """Stage a jittable fn (closed over params) to a TF SavedModel with the
    example args' fixed shapes."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    module = tf.Module()
    specs = [tf.TensorSpec(np.asarray(a).shape,
                           tf.as_dtype(np.asarray(a).dtype))
             for a in example_args]
    module.f = tf.function(tf_fn, input_signature=specs, autograph=False)
    tf.saved_model.save(module, out_dir)


def export_tflite(fn: Callable, example_args: Sequence[Any],
                  out_path: str) -> bytes:
    """jittable fn -> .tflite flatbuffer (SELECT_TF_OPS fallback enabled,
    ≙ convert_tacotron2_tflite / tts/tf/utils/tflite.py:4-26)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    specs = [tf.TensorSpec(np.asarray(a).shape,
                           tf.as_dtype(np.asarray(a).dtype))
             for a in example_args]
    cf = tf.function(tf_fn, input_signature=specs,
                     autograph=False).get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    converter.optimizations = [tf.lite.Optimize.DEFAULT]
    flatbuffer = converter.convert()
    with open(out_path, "wb") as f:
        f.write(flatbuffer)
    return flatbuffer


def load_tflite(path: str):
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    return interp


def run_tflite(interp, *args: np.ndarray):
    """Run a loaded TFLite interpreter on positional inputs."""
    in_details = interp.get_input_details()
    for detail, arg in zip(in_details, args):
        interp.set_tensor(detail["index"], np.asarray(arg))
    interp.invoke()
    outs = [interp.get_tensor(d["index"]) for d in interp.get_output_details()]
    return outs[0] if len(outs) == 1 else outs


def max_abs_diff(a, b) -> float:
    """Numerical-parity metric (≙ compare_torch_tf,
    convert_torch_to_tf_utils.py:26-29; also the BASELINE.json mel metric)."""
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
