"""Capture file I/O (SURVEY.md §1.1 L4, §2 C11)."""

from srcdsp_tpu.io.capture import (  # noqa: F401
    CaptureMeta, read_capture, write_capture, read_capture_blocks,
)
