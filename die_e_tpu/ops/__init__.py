from die_e_tpu.ops.rows import gather_rows, pallas_available

__all__ = ["gather_rows", "pallas_available"]
