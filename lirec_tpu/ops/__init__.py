from lirec_tpu.ops.gather_pool import gather_masked_sum  # noqa: F401
