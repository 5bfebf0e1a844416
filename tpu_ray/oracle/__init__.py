from tpu_ray.oracle.cpu_oracle import CpuOracle

__all__ = ["CpuOracle"]
