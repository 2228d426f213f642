from srcdsp_tpu.testing import signals  # noqa: F401
