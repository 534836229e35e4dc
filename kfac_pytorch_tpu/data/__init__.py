"""Host-side data pipeline: deterministic augmenting batch loaders.

``make_loader`` returns the native C++ threaded loader when
``native/libkfac_dataloader.so`` is built (prefetch ring overlapping batch
assembly with device compute) and the bitwise-identical pure-NumPy loader
otherwise.
"""

from kfac_pytorch_tpu.data.loader import (  # noqa: F401
    NativeBatchLoader,
    PyBatchLoader,
    epoch_order,
    make_loader,
    native_available,
)
