"""commandlineflags_test.cc port: the training-tool flag parser grammar
(src/training/common/commandlineflags.cpp:174-334)."""

import pytest

from tesseract_spark.flags import FlagRegistry, parse_command_line_flags


@pytest.fixture()
def reg():
    # the test fixture flag set of commandlineflags_test.cc:17-28
    r = FlagRegistry()
    r.int_flag("foo_int", 0, "Integer flag for testing")
    r.int_flag("bar_int", 0, "Integer flag for testing")
    r.double_flag("foo_double", 0.1, "Double flag for testing")
    r.double_flag("bar_double", 0.2, "Double flag for testing")
    r.string_flag("foo_string", "foo", "String flag for testing")
    r.string_flag("bar_string", "bar", "String flag for testing")
    r.bool_flag("foo_bool", False, "Bool flag for testing")
    r.bool_flag("bar_bool", False, "Bool flag for testing")
    r.string_flag("q", "", "Single character name")
    return r


def parse(reg, argv):
    return parse_command_line_flags("", argv, remove_flags=True, registry=reg)


def expect_exit1(reg, argv):
    with pytest.raises(SystemExit) as e:
        parse(reg, argv)
    assert e.value.code == 1


def test_remove_flags(reg):
    argv = ["Progname", "--foo_int", "3", "file1.h", "file2.h"]
    out = parse(reg, argv)
    assert out == ["Progname", "file1.h", "file2.h"]


def test_exits_with_error_on_invalid_flag(reg, capsys):
    expect_exit1(reg, ["", "--test_nonexistent_flag"])
    assert "ERROR: Non-existent flag" in capsys.readouterr().err


def test_parse_integer_flags(reg):
    parse(reg, ["", "--foo_int=3", "--bar_int", "-4"])
    assert reg.get("foo_int").value == 3
    assert reg.get("bar_int").value == -4

    expect_exit1(reg, ["", "--bar_int"])
    # "--foo_int=3" is consumed as bar_int's VALUE and fails strtol
    expect_exit1(reg, ["", "--bar_int", "--foo_int=3"])
    expect_exit1(reg, ["", "--bar_int="])


def test_parse_double_flags(reg):
    parse(reg, ["", "--foo_double=3.14", "--bar_double", "1.2"])
    assert reg.get("foo_double").value == 3.14
    assert reg.get("bar_double").value == 1.2

    expect_exit1(reg, ["", "--bar_double"])
    expect_exit1(reg, ["", "--bar_double="])


def test_parse_string_flags(reg):
    parse(reg, ["", "--foo_string=abc", "--bar_string", "def"])
    assert reg.get("foo_string").value == "abc"
    assert reg.get("bar_string").value == "def"

    expect_exit1(reg, ["", "--bar_string"])

    # --string_flag= sets the EMPTY string (unlike the numeric flags)
    reg.get("bar_string").set_value("bar")
    parse(reg, ["", "--bar_string="])
    assert reg.get("bar_string").value == ""


def test_parse_bool_flags(reg):
    reg.get("foo_bool").set_value(False)
    reg.get("bar_bool").set_value(False)
    parse(reg, ["", "--foo_bool=true", "--bar_bool=1"])
    assert reg.get("foo_bool").value is True
    assert reg.get("bar_bool").value is True

    reg.get("foo_bool").set_value(True)
    reg.get("bar_bool").set_value(True)
    parse(reg, ["", "--foo_bool=false", "--bar_bool=0"])
    assert reg.get("foo_bool").value is False
    assert reg.get("bar_bool").value is False

    reg.get("bar_bool").set_value(False)
    parse(reg, ["", "--bar_bool"])  # --flag form implies true
    assert reg.get("bar_bool").value is True

    expect_exit1(reg, ["", "--bar_bool="])


def test_parse_old_single_hyphen_flags(reg):
    # single-character flag with one hyphen (backward compatibility)
    assert reg.get("q").value == ""
    parse(reg, ["", "-q", "text"])
    assert reg.get("q").value == "text"


def test_usage_exits_zero(reg, capsys):
    with pytest.raises(SystemExit) as e:
        parse(reg, ["Progname"])
    assert e.value.code == 0
    assert "USAGE: " in capsys.readouterr().out


def test_help_lists_flags(reg, capsys):
    with pytest.raises(SystemExit) as e:
        parse(reg, ["Progname", "--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--foo_int" in out and "(type:int default:0)" in out
    assert "--foo_double" in out and "type:double" in out
