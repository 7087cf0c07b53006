"""Output writer format tests (reference aira.cpp:252, 326-358)."""

import io

import numpy as np

from moip_aira_tpu.api import FrontResult
from moip_aira_tpu.io.writer import write_out


def render(points, ips=24, sols=None, cpu=0.031, wall=0.055):
    front = FrontResult(
        points=np.asarray(points, dtype=np.int64),
        ip_count=ips,
        cpu_seconds=cpu,
        elapsed_seconds=wall,
    )
    buf = io.StringIO()
    write_out(buf, front, version_tag="testtag")
    return buf.getvalue()


def test_reference_format():
    text = render([[50, 24], [21, 55]])
    lines = text.split("\n")
    assert lines[0] == ""
    assert lines[1] == "Using improved algorithm at testtag"
    # tab-separated values with a trailing tab (aira.cpp:342-344)
    assert lines[2] == "50\t24\t"
    assert lines[3] == "21\t55\t"
    assert lines[4] == ""
    assert lines[5] == "---"
    # footer: width-8 fixed-precision columns (aira.cpp:348-358)
    assert lines[6] == "   0.031 CPU seconds"
    assert lines[7] == "   0.055 elapsed seconds"
    assert lines[8] == "      24 IPs solved"
    assert lines[9] == "       2 Solutions found"


def test_negative_values():
    text = render([[-1596, -1900]])
    assert "-1596\t-1900\t" in text
    assert "       1 Solutions found" in text
