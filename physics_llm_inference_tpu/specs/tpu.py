"""TPU chip spec table + runtime detection.

TPU-native analogue of the reference's GPU spec tables and device detection
(ref: ch03/roofline.py:4-33 HardwareSpec presets, ch04/gpu_architecture.py:6-109
GPUSpec + get_gpu_spec). Where the GPU model tracks SMs/warps/shared-memory,
the TPU model tracks MXU/VPU peak rates, HBM bandwidth, VMEM capacity, and the
ICI/DCN interconnect — the quantities that actually bound a TPU inference
kernel (MXU FLOPs, HBM streaming, VMEM residency, collective bandwidth).

Values are public "class numbers" for each generation; treat as planning
constants, not measured guarantees.
"""
from __future__ import annotations

from dataclasses import dataclass, field

GiB = 1024**3
MiB = 1024**2


@dataclass(frozen=True)
class TPUSpec:
    """Per-chip spec used by the roofline and cost models."""

    name: str
    # Compute peaks, per chip.
    bf16_tflops: float
    int8_tops: float
    fp32_tflops: float
    # Memory system.
    hbm_bytes: int
    hbm_gbps: float            # GB/s (1e9 bytes/s)
    vmem_bytes: int            # on-chip vector memory per core
    # Compute unit geometry.
    mxu_shape: tuple[int, int] = (128, 128)
    vpu_shape: tuple[int, int] = (8, 128)
    num_cores: int = 1
    # Interconnect (per-link, one direction).
    ici_gbps_per_link: float = 0.0
    ici_num_links: int = 0     # torus degree: 4 for 2D, 6 for 3D
    dcn_gbps: float = 25.0     # per-host data-center network, order of magnitude

    @property
    def peak_flops(self) -> float:
        """Peak bf16 FLOP/s (the MXU number that matters for inference)."""
        return self.bf16_tflops * 1e12

    @property
    def peak_int8_ops(self) -> float:
        return self.int8_tops * 1e12

    @property
    def hbm_bandwidth(self) -> float:
        """HBM bandwidth in bytes/s."""
        return self.hbm_gbps * 1e9

    @property
    def ici_bandwidth(self) -> float:
        """Aggregate ICI bandwidth in bytes/s (all links, one direction)."""
        return self.ici_gbps_per_link * self.ici_num_links * 1e9

    def ridge_point(self, dtype: str = "bf16") -> float:
        """FLOP/byte at which the chip transitions memory- -> compute-bound."""
        peak = {"bf16": self.peak_flops, "int8": self.peak_int8_ops,
                "fp32": self.fp32_tflops * 1e12}[dtype]
        return peak / self.hbm_bandwidth


TPU_V4 = TPUSpec(
    name="TPU v4",
    bf16_tflops=275.0,
    int8_tops=275.0,           # v4 has no int8 MXU speedup
    fp32_tflops=275.0 / 8,
    hbm_bytes=32 * GiB,
    hbm_gbps=1228.0,
    vmem_bytes=128 * MiB,
    num_cores=2,
    ici_gbps_per_link=45.0,
    ici_num_links=6,
)

TPU_V5E = TPUSpec(
    name="TPU v5e",
    bf16_tflops=197.0,
    int8_tops=394.0,
    fp32_tflops=197.0 / 4,
    hbm_bytes=16 * GiB,
    hbm_gbps=819.0,
    vmem_bytes=128 * MiB,
    num_cores=1,
    ici_gbps_per_link=45.0,
    ici_num_links=4,           # 2D torus
)

TPU_V5P = TPUSpec(
    name="TPU v5p",
    bf16_tflops=459.0,
    int8_tops=918.0,
    fp32_tflops=459.0 / 4,
    hbm_bytes=95 * GiB,
    hbm_gbps=2765.0,
    vmem_bytes=128 * MiB,
    num_cores=2,
    ici_gbps_per_link=90.0,
    ici_num_links=6,           # 3D torus
)

TPU_V6E = TPUSpec(
    name="TPU v6e",
    bf16_tflops=918.0,
    int8_tops=1836.0,
    fp32_tflops=918.0 / 4,
    hbm_bytes=32 * GiB,
    hbm_gbps=1640.0,
    vmem_bytes=128 * MiB,
    num_cores=1,
    ici_gbps_per_link=90.0,
    ici_num_links=4,
)

TPU_SPECS: dict[str, TPUSpec] = {
    "v4": TPU_V4,
    "v5e": TPU_V5E,
    "v5 lite": TPU_V5E,
    "v5p": TPU_V5P,
    "v6e": TPU_V6E,
    "v6 lite": TPU_V6E,
}

_DEFAULT = TPU_V5E


def get_tpu_spec(device=None) -> TPUSpec:
    """Detect the current TPU generation, falling back to v5e constants.

    TPU analogue of ref ch04/gpu_architecture.py:79-109 (get_gpu_spec with
    torch.cuda.get_device_properties + fallback). On CPU test platforms this
    returns the v5e planning spec.
    """
    if device is None:
        import jax

        devices = jax.devices()
        if not devices:
            return _DEFAULT
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, spec in TPU_SPECS.items():
        if key in kind:
            return spec
    return _DEFAULT
