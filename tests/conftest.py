import os

# Force CPU with 8 virtual devices BEFORE jax import so sharding tests can
# exercise a real multi-device mesh without TPU hardware. The environment may
# preset JAX_PLATFORMS (e.g. 'axon' for the tunneled TPU) — tests always
# override: parity thresholds assume f32 CPU matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize (e.g. /root/.axon_site) may have imported jax already with
# the axon TPU platform selected; the config update below still wins as long
# as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """`-m tpu` selects the opt-in real-hardware lane (tests spawn TPU
    subprocesses; this parent process stays on the forced-CPU backend).
    Default runs DESELECT those tests so the CPU suite stays 0-skipped."""
    if "tpu" in (config.option.markexpr or ""):
        return
    items[:] = [item for item in items if "tpu" not in item.keywords]


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    from lirec_tpu.data import synthetic

    root = tmp_path_factory.mktemp("mg_synth")
    synthetic.generate(str(root))
    return str(root)


@pytest.fixture(scope="session")
def synth_cfg(synth_root):
    from lirec_tpu.data import synthetic

    return synthetic.make_config(synth_root)
