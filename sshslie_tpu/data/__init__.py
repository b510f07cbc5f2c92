"""Host-side input pipeline: cube store, patch sampler, prefetcher."""

from sshslie_tpu.data.datasets import CubeStore, PatchSampler, Prefetcher  # noqa: F401
