"""harmony_tpu: a TPU-native implementation of the Harmony single-cell
integration algorithm (the capabilities of ``immunogenomics/harmony``
v2.0.4, rebuilt from scratch on JAX/XLA/Pallas).

Public surface:

* :func:`run_harmony` — the ``RunHarmony`` equivalent (NumPy in/out).
* :func:`harmony_options` — advanced options (``harmony_options()``).
* :class:`HarmonyResult` — the engine-object equivalent
  (``return_object=TRUE``).
* :func:`scale_data` — the ``scaleData`` preprocessing helper.
* :mod:`harmony_tpu.datasets` — the bundled reference datasets.
"""

from .config import (  # noqa: F401
    HarmonyConfig,
    HarmonyConfigError,
    HarmonyOptions,
    harmony_options,
)
from .api import HarmonyResult, run_harmony  # noqa: F401
from .scale import scale_data  # noqa: F401

__version__ = "0.4.0"
