"""End-to-end coded link: fused FSK demod -> scale-free LLRs -> Pallas
LDPC decode (bench/coded_link_onchip.py's pipeline, CPU interpret tier)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_spec = importlib.util.spec_from_file_location(
    "coded_link_onchip", os.path.join(REPO, "bench", "coded_link_onchip.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_coded_link_cpu_decodes_clean(capsys):
    _mod.main(["--platform", "cpu", "--channels", "2",
               "--words", "8", "--snr-db", "14"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["info_ber"] == 0.0
    assert rec["ok_fraction"] == 1.0
