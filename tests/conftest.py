"""Test configuration: force an 8-device CPU mesh so sharding tests run
anywhere (the TPU-native substitute for multi-chip testing, per SURVEY §4e).
Must run before jax is imported anywhere."""
import os

# torch.jit must be disabled BEFORE torch is first imported anywhere in
# the test process: the reference-parity tests import /root/reference
# modules whose @torch.jit.script functions reference stubbed deps
# (kornia), which only works when scripting is a no-op.
os.environ.setdefault("PYTORCH_JIT", "0")

# Force CPU: the session env may point JAX at a (single, tunneled) TPU, but
# the unit/sharding tests are designed for a virtual 8-device CPU mesh.
# Set FREESPLAT_TEST_TPU=1 to run the suite on real hardware instead.
if not os.environ.get("FREESPLAT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("FREESPLAT_TEST_TPU"):
    # The container's axon sitecustomize force-selects the TPU plugin via
    # jax.config, which overrides the env var — override it back.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big model graphs take minutes to
# compile even on CPU; cache hits make reruns fast.
from freesplat_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.jax_cache_cpu")
