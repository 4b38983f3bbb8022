"""TPU-native multi-pattern sequence matching framework.

A ground-up re-design of the PrimerMatch/PeptideScan capability set
(EdwardsLabProjects/sequence-alignment-tools) for TPU hardware:

- The sequence database is a flat, EOS-delimited ``uint8`` code array in HBM
  (the reference's ``.sqn`` normalized flat coordinate space,
  ``fasta_io.t:139-263``), position-sharded across a device mesh with static
  overlap halos.
- Exact and k-mismatch multi-pattern scanning runs as one-hot correlation on
  the MXU (the reference scans char-at-a-time through an Aho-Corasick keyword
  tree / shift-and bitvectors, ``keyword_tree.t:427-486``,
  ``shift_and.cc:218-254``).
- k-edit (indel) scanning runs as a row-vectorized Sellers semi-global DP
  with a cumulative-min associative scan for the insertion term (same
  candidate set as the reference's Wu-Manber bitvectors,
  ``shift_and_inexact.cc:249-350``).
- Candidate clusters are verified by a banded anchored edit-distance DP that
  reproduces the reference's tie-breaking and constraint semantics bit-for-bit
  (``pattern_alignment.cc:117-705``).

Import alias: ``import sequence_alignment_tools_tpu as sat``.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache so repeated CLI invocations don't pay
    recompilation (the scan kernels are shape-stable across runs)."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "SAT_TPU_CACHE", _os.path.expanduser("~/.cache/sat_tpu_xla")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _honor_platform_env() -> None:
    """jax is pre-imported at interpreter startup on this image, so
    ``JAX_PLATFORMS`` set on a command line is normally too late; re-apply it
    here (backends are still uninitialized at package-import time)."""
    plat = _os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover
            pass


class _LazyJaxBoot:
    """Deferred jax boot for site-less (``sat`` launcher / ``python -S``)
    interpreters.

    This image preimports jax at EVERY interpreter start (sitecustomize →
    ``axon.register``, ~2.5 s measured), which is the whole cold one-shot
    floor.  The ``sat`` launcher boots with ``-S`` so host-native tools
    (shift-and, Sellers rows, mer census — the entire one-shot regime)
    never pay it.  When a device route *does* import jax, this hook fires
    on the first top-level ``import jax``: it completes the real import,
    replays the image's sitecustomize (PJRT plugin registration is
    designed to run after ``import jax`` — the stock boot does exactly
    that), applies the package's cache/platform config, and hands the
    import machinery a no-op loader for the already-initialized module
    (re-exec would double-run jax's init).
    """

    def find_spec(self, name, path=None, target=None):
        if name != "jax" or path is not None:
            return None
        import importlib
        import importlib.util

        try:
            _sys.meta_path.remove(self)
        except ValueError:  # pragma: no cover - already fired
            return None
        mod = importlib.import_module("jax")
        if "sitecustomize" not in _sys.modules:
            try:
                importlib.import_module("sitecustomize")
            except Exception:  # pragma: no cover - bare env without axon
                pass
        _setup_compilation_cache()
        _honor_platform_env()

        class _Reuse(importlib.abc.Loader):
            def create_module(self, spec):
                return mod

            def exec_module(self, module):
                pass

        return importlib.util.spec_from_loader("jax", _Reuse())


import sys as _sys

if "jax" in _sys.modules:
    # Normal boot: sitecustomize already imported + registered jax.
    _setup_compilation_cache()
    _honor_platform_env()
else:
    # Site-less boot (sat launcher): defer everything jax until a route
    # actually needs the device; host-native tools stay jax-free.
    import importlib.abc  # noqa: F401  (used inside the hook)

    _sys.meta_path.insert(0, _LazyJaxBoot())

from . import utils  # noqa: F401
