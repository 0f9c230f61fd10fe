from pcgan_tpu.models.registry import define_G, define_D, define_C  # noqa: F401
