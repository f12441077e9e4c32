"""functions/format — utils.FormatBytes/FormatMemory shapes (M15)."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.format import (
    format_bytes,
    format_memory,
)


def test_format_bytes():
    # expectations derived by hand from utils/utils.go:72-83
    assert format_bytes(0) == "0 B"
    assert format_bytes(1023) == "1023 B"
    assert format_bytes(1024) == "1.0 KB"
    assert format_bytes(1536) == "1.5 KB"
    assert format_bytes(1024 * 1024) == "1.0 MB"
    assert format_bytes(47_2 * 10**8) == "44.0 GB"
    assert format_bytes(1024**4) == "1.0 TB"


def test_format_memory():
    assert format_memory(3 * 1024 * 1024, 10 * 1024 * 1024) == "Alloc: 3MB, Sys: 10MB"
