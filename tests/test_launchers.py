"""Launcher scripts (scripts/test/*.sh, scripts/train/*.sh) must only pass
flags their python driver actually declares (ref scripts/test|train/*.sh)."""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCHERS = {
    "scripts/test/svi_shot.sh": "scripts/test_svi.py",
    "scripts/test/svi_film.sh": "scripts/test_svi.py",
    "scripts/test/svi_tom.sh": "scripts/test_svi.py",
    "scripts/test/svi_dance.sh": "scripts/test_svi_dance.py",
    "scripts/test/svi_talk.sh": "scripts/test_svi_talk.py",
    "scripts/train/svi_shot.sh": "scripts/train_svi.py",
    "scripts/train/svi_film.sh": "scripts/train_svi.py",
    "scripts/train/svi_dance.sh": "scripts/train_svi_dance.py",
    "scripts/train/svi_talk.sh": "scripts/train_svi_talk.py",
}


def _declared_flags(driver):
    src = open(os.path.join(REPO, driver)).read()
    flags = set(re.findall(r'add_argument\(\s*"(--[\w-]+)"', src))
    # variant drivers extend a base parser
    if "train_svi_" in driver:
        flags |= _declared_flags("scripts/train_svi.py")
    return flags


@pytest.mark.parametrize("launcher,driver", sorted(LAUNCHERS.items()))
def test_launcher_flags_exist(launcher, driver):
    lines = [
        line for line in open(os.path.join(REPO, launcher)).read().splitlines()
        if not line.lstrip().startswith("#")
    ]
    # only the driver's own command block counts — launchers may invoke other
    # tools with their own flags (e.g. the WARM_COMPILE cache pre-seed)
    start = next(i for i, l in enumerate(lines) if driver in l)
    block = [lines[start]]
    while block[-1].rstrip().endswith("\\") and start + len(block) < len(lines):
        block.append(lines[start + len(block)])
    used = set(re.findall(r"(--[\w-]+)", "\n".join(block)))
    declared = _declared_flags(driver)
    unknown = used - declared
    assert not unknown, f"{launcher} passes undeclared flags: {sorted(unknown)}"


def test_gradio_launcher_syntax():
    subprocess.run(["bash", "-n", os.path.join(REPO, "scripts/gradio_demo.sh")],
                   check=True)


def test_drivers_expose_help():
    """Every launcher's driver parses --help without importing heavy deps at
    module import time (keeps the CLIs usable for config inspection)."""
    for driver in sorted(set(LAUNCHERS.values())):
        r = subprocess.run([sys.executable, os.path.join(REPO, driver), "--help"],
                           capture_output=True, text=True, cwd=REPO, timeout=300)
        assert r.returncode == 0, f"{driver} --help failed: {r.stderr[-400:]}"
