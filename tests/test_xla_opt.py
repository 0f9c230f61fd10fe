"""--xla_opt resolution (platform.compiler_options_for): the measured
TPU-bf16 scoped-VMEM default must NEVER leak onto CPU or f32 runs (the
.pth-parity lowering stays stock XLA), and explicit specs must parse."""

import pytest

from pcgan_tpu.config import Config, ModelConfig, RunConfig
from pcgan_tpu.platform import (DEFAULT_TPU_BF16_XLA_OPT,
                                compiler_options_for, parse_compiler_options)


def test_parse_compiler_options():
    assert parse_compiler_options("") is None
    assert parse_compiler_options(" , ") is None
    assert parse_compiler_options("a=1") == {"a": "1"}
    assert parse_compiler_options("a=1, b=true") == {"a": "1", "b": "true"}
    # values keep their own '=' (XLA parses its own types)
    assert parse_compiler_options("a=x=y") == {"a": "x=y"}
    with pytest.raises(ValueError):
        parse_compiler_options("not_key_value")


def test_default_never_applies_on_cpu_backend():
    # the suite runs on the CPU backend: even bf16 configs resolve to None
    # (TPU-prefixed options would be rejected by the CPU compiler)
    assert compiler_options_for(
        Config(model=ModelConfig(dtype="bfloat16"))) is None


def test_f32_and_off_resolve_to_stock_xla():
    assert compiler_options_for(
        Config(model=ModelConfig(dtype="float32"))) is None
    assert compiler_options_for(
        Config(model=ModelConfig(dtype="bfloat16"),
               run=RunConfig(xla_opt="off"))) is None
    assert compiler_options_for(
        Config(run=RunConfig(xla_opt=" OFF "))) is None


def test_explicit_spec_overrides_everywhere():
    opts = compiler_options_for(
        Config(model=ModelConfig(dtype="float32"),
               run=RunConfig(xla_opt="xla_foo=1,xla_bar=2")))
    assert opts == {"xla_foo": "1", "xla_bar": "2"}


def test_default_constant_parses():
    assert parse_compiler_options(DEFAULT_TPU_BF16_XLA_OPT) == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}
