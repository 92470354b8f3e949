"""lamp_tpu — a TPU-native deep learning and scientific computing framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of pityka/lamp
(see SURVEY.md): tensor substrate, module/optimizer/loss toolkit, streaming
data loaders, full-featured training loops, SPMD data/tensor parallelism over
device meshes, a model zoo (MLP/CNN/RNN/Transformer/BERT/GPT/GNN), tokenizer,
checkpointing + safetensors/ONNX interop, and classic-ML sidecars.
"""

__version__ = "0.1.0"

from . import core, data, io, models, nn, ops, optim, parallel, sidecars, train

__all__ = ["core", "data", "io", "models", "nn", "ops", "optim", "parallel",
           "sidecars", "train", "__version__"]
