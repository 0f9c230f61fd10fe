"""The canonical scripts (SURVEY.md SS2 C16: the reference ships shell
one-liners with the paper's hyperparameters) must keep parsing against the
live flag surface — a renamed/removed flag must fail HERE, not when a user
runs the recipe.

Each ``scripts/*.sh`` is scanned for ``python <cli>.py`` invocations; the
flag list (shell substitutions resolved to dummy values, ``"$@"`` dropped)
is run through the same ``parse_config`` the CLI would use. Nothing
executes — this is a parse-only surface pin.
"""

import glob
import os
import re
import shlex

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
SCRIPTS = sorted(glob.glob(os.path.join(ROOT, "scripts", "*.sh")))

# CLIs whose flags parse_config understands, and whether they parse in
# train mode; tool CLIs with their own argparse are checked for existence
_PARSE_MODE = {"train.py": True, "test.py": False, "evaluate.py": False}


def _invocations(path):
    """Yield (cli, argv) for each python invocation in a script, with
    line continuations joined and shell substitutions stubbed."""
    text = open(path).read()
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("exec "):        # exec python tools/serve_http.py
            line = line[len("exec "):]
        if not line.startswith("python "):
            continue
        # ${VAR:-default} -> default; "${ARR[@]}" / "$@" -> dropped;
        # bare $VAR / ${VAR} -> dummy
        line = re.sub(r"\$\{[A-Za-z_]+:-([^}]*)\}", r"\1", line)
        line = re.sub(r'"?\$\{[A-Za-z_]+\[@\]\}"?', "", line)
        line = line.replace('"$@"', "").replace("$@", "")
        line = re.sub(r"\$\{[A-Za-z_]+\}", "dummy", line)
        line = re.sub(r"\$[A-Za-z_]+", "dummy", line)
        toks = shlex.split(line)
        yield toks[1], toks[2:]


def test_scripts_exist():
    assert len(SCRIPTS) >= 7, SCRIPTS


@pytest.mark.parametrize("path", SCRIPTS,
                         ids=[os.path.basename(p) for p in SCRIPTS])
def test_script_flags_parse(path):
    from pcgan_tpu.config import parse_config
    found = 0
    for cli, argv in _invocations(path):
        assert os.path.exists(os.path.join(ROOT, cli)), \
            f"{path} invokes missing CLI {cli}"
        found += 1
        if cli in _PARSE_MODE:
            cfg = parse_config(argv, is_train=_PARSE_MODE[cli])
            assert cfg.data.crop_size > 0
    assert found, f"no python invocations found in {path}"
