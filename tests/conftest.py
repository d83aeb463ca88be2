"""Test harness: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 'Implication for the TPU
build'). Must run before jax is imported anywhere."""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (TPU) and a
# sitecustomize imports jax at interpreter startup, so the env var is already
# baked into jax.config by the time this file runs. Unit tests must run on CPU
# with virtual devices (TPU convs default to bf16 on the MXU, which breaks f32
# golden-parity tolerances), so override via jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the round gate is dominated by
# full-network compiles that are identical run-to-run. Cache survives across
# pytest invocations (VERDICT r2 weak #7); keyed on HLO so code changes that
# alter a graph recompile only that graph.
_CACHE_DIR = os.environ.get("REFVSR_TEST_COMPILE_CACHE",
                            "/tmp/refvsr_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # older jax without the knobs

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by full-network jit compiles (minutes each on the CPU
# backend). `pytest -m "not slow"` is the <5 min inner loop; the full suite
# (including these) is the round-boundary gate.
_SLOW_MODULES = {
    "test_train_e2e", "test_refvsr_net", "test_refvsr_ir", "test_parallel",
    "test_spynet_parity", "test_matching_parity", "test_loader",
    "test_cli_train", "test_pretrained_assets", "test_round3_features",
    "test_pipeline_stream", "test_full_net_parity",
    "test_spatial_8k_lowering",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-network compile-heavy tests (round gate)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def write_clip_triplet(ds, split, cam, clip, n_frames, lr_h, lr_w, seed):
    """Write consistent HR / LRx2 / LRx4 frames (LRs bicubic-derived from HR,
    like the real RealMCVSR captures) — makes training losses learnable."""
    import os

    from PIL import Image

    from refvsr_tpu.data.np_ops import np_resize
    rng = np.random.default_rng(seed)
    for i in range(n_frames):
        # smooth content: low-res noise upsampled (natural-image-ish)
        base = rng.random((lr_h // 4, lr_w // 4, 3)).astype(np.float32)
        hr = np.clip(np_resize(base, size=(4 * lr_h, 4 * lr_w),
                               mode="bicubic"), 0, 1)
        for sub, img in (("HR", hr),
                         ("LRx2", np_resize(hr, scale_factor=0.5,
                                            mode="bicubic")),
                         ("LRx4", np_resize(hr, scale_factor=0.25,
                                            mode="bicubic"))):
            d = os.path.join(str(ds), split, sub, cam, clip)
            os.makedirs(d, exist_ok=True)
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(d, f"{i:04d}.png"))


@pytest.fixture(scope="session")
def fake_dataset(tmp_path_factory):
    """Synthetic RealMCVSR tree shared across test modules (read-only)."""
    root = tmp_path_factory.mktemp("RealMCVSR_root")
    ds = root / "RealMCVSR"
    lr_h, lr_w = 64, 64
    n_frames = 8
    for split, clips in (("train", ["0000", "0001"]), ("valid", ["0002"]),
                         ("test", ["0003"])):
        for clip in clips:
            for cam in ("UW", "W", "T"):
                write_clip_triplet(ds, split, cam, clip, n_frames, lr_h,
                                   lr_w, seed=hash((split, clip, cam)) % 2**31)
    return str(root)
