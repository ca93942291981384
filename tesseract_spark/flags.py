"""Command-line flag parsing for the training-tool CLIs.

Port of ``ParseCommandLineFlags`` (src/training/common/
commandlineflags.{h,cpp}:86-334) with the reference's exact argument
grammar, pinned by the unittest/commandlineflags_test.cc fixtures:

- one and two leading hyphens are treated identically
  (commandlineflags.cpp:196-200);
- a value arrives either as ``--flag=value`` or as the next argument;
- ``--int_flag=`` / ``--double_flag=`` / ``--bool_flag=`` (empty rhs)
  are errors, but ``--string_flag=`` sets the empty string
  (commandlineflags.cpp:224-227, 253-257, 290-293, 308-310);
- a bool flag with no value means true; valid rhs values are
  true/false/1/0 only (commandlineflags.cpp:281-305);
- integers parse with strtol full-consumption semantics, doubles with
  the C locale (SafeAtoi/SafeAtod, commandlineflags.cpp:113-133);
- an unknown flag is a hard error (commandlineflags.cpp:327-329);
- with ``remove_flags`` the surviving argv keeps argv[0] followed by
  the first non-flag argument onward (commandlineflags.cpp:331-334).

Errors print ``ERROR: ...`` and raise ``SystemExit(1)`` — the Python
analogue of the reference's ``exit(1)`` so tests can assert the exit
code exactly as EXPECT_EXIT does.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Union


@dataclass
class Flag:
    """One registered FLAGS_ param (INT/DOUBLE/BOOL/STRING_PARAM_FLAG,
    commandlineflags.h:27-63)."""

    name: str
    kind: str  # int | double | bool | string
    default: Union[int, float, bool, str]
    info: str
    value: Union[int, float, bool, str] = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.value is None:
            self.value = self.default

    def set_value(self, v) -> None:
        self.value = v


class FlagRegistry:
    """GlobalParams()'s FLAGS_ namespace as a dict of typed flags."""

    def __init__(self) -> None:
        self._flags: dict[str, Flag] = {}

    def _declare(self, name: str, kind: str, default, info: str) -> Flag:
        f = Flag(name, kind, default, info)
        self._flags[name] = f
        return f

    def int_flag(self, name: str, default: int, info: str) -> Flag:
        return self._declare(name, "int", int(default), info)

    def double_flag(self, name: str, default: float, info: str) -> Flag:
        return self._declare(name, "double", float(default), info)

    def bool_flag(self, name: str, default: bool, info: str) -> Flag:
        return self._declare(name, "bool", bool(default), info)

    def string_flag(self, name: str, default: str, info: str) -> Flag:
        return self._declare(name, "string", str(default), info)

    def get(self, name: str) -> Flag | None:
        return self._flags.get(name)

    def usage_lines(self) -> list[str]:
        """PrintCommandLineFlags (commandlineflags.cpp:136-172): one
        line per flag, grouped int/double/bool/string in declaration
        order within each type."""
        out = []
        for kind in ("int", "double", "bool", "string"):
            for f in self._flags.values():
                if f.kind != kind:
                    continue
                if kind == "bool":
                    shown = "true" if f.value else "false"
                elif kind == "double":
                    shown = "{:g}".format(f.value)
                else:
                    shown = f.value
                out.append(
                    "  --%s  %s  (type:%s default:%s)"
                    % (f.name, f.info, kind, shown)
                )
        return out


GLOBAL_FLAGS = FlagRegistry()


def _fail(msg: str) -> None:
    print("ERROR: " + msg, file=sys.stderr)
    raise SystemExit(1)


def _safe_atoi(s: str) -> int | None:
    """SafeAtoi (commandlineflags.cpp:113-117): strtol base 10, the
    whole string must be consumed."""
    try:
        return int(s, 10)
    except ValueError:
        return None


def _safe_atod(s: str) -> float | None:
    """SafeAtod (commandlineflags.cpp:119-133): C-locale stream read;
    a NaN result (parse failure or literal nan) is a failure."""
    try:
        v = float(s)
    except ValueError:
        return None
    if v != v:  # NaN — the reference's isnan failure marker
        return None
    return v


def parse_command_line_flags(
    usage: str,
    argv: list[str],
    remove_flags: bool = True,
    registry: FlagRegistry | None = None,
) -> list[str]:
    """ParseCommandLineFlags (commandlineflags.cpp:174-334).

    ``argv`` includes the program name at index 0.  Returns the
    surviving argv (program name + non-flag tail) when
    ``remove_flags``, else the original list.  Raises SystemExit(0)
    for help/usage/version requests and SystemExit(1) on bad input.
    """
    reg = registry if registry is not None else GLOBAL_FLAGS
    if len(argv) == 1:
        print("USAGE: %s" % usage)
        for line in reg.usage_lines():
            print(line)
        raise SystemExit(0)
    if len(argv) > 1 and argv[1] in ("-v", "--version"):
        from . import __version__

        print(__version__)
        raise SystemExit(0)

    i = 1
    while i < len(argv):
        current = argv[i]
        if not current.startswith("-"):
            break
        # One or two hyphens are identical (commandlineflags.cpp:196-200).
        arg = current[1:]
        if arg.startswith("-"):
            arg = arg[1:]
        if arg == "help":
            print("Usage:\n  %s [OPTION ...]\n" % usage)
            for line in reg.usage_lines():
                print(line)
            raise SystemExit(0)
        eq = arg.find("=")
        rhs = arg[eq + 1 :] if eq >= 0 else None
        lhs = arg if eq < 0 else arg[:eq]
        if not lhs:
            _fail("Bad argument: %s" % argv[i])

        flag = reg.get(lhs)
        if flag is None:
            _fail("Non-existent flag %s" % argv[i])

        if flag.kind == "int":
            if rhs is not None:
                if not rhs:
                    _fail("Bad argument: %s" % argv[i])
                val = _safe_atoi(rhs)
                if val is None:
                    _fail(
                        "Could not parse int from %s in flag %s"
                        % (rhs, argv[i])
                    )
            else:
                if i + 1 >= len(argv):
                    _fail("Could not find value argument for flag %s" % lhs)
                i += 1
                val = _safe_atoi(argv[i])
                if val is None:
                    _fail("Could not parse int32_t from %s" % argv[i])
            flag.set_value(val)
        elif flag.kind == "double":
            if rhs is not None:
                if not rhs:
                    _fail("Bad argument: %s" % argv[i])
                val = _safe_atod(rhs)
                if val is None:
                    _fail(
                        "Could not parse double from %s in flag %s"
                        % (rhs, argv[i])
                    )
            else:
                if i + 1 >= len(argv):
                    _fail("Could not find value argument for flag %s" % lhs)
                i += 1
                val = _safe_atod(argv[i])
                if val is None:
                    _fail("Could not parse double from %s" % argv[i])
            flag.set_value(val)
        elif flag.kind == "bool":
            if rhs is None:
                val = True  # --flag form
            elif not rhs:
                _fail("Bad argument: %s" % argv[i])
            elif rhs in ("false", "0"):
                val = False
            elif rhs in ("true", "1"):
                val = True
            else:
                _fail("Could not parse bool from flag %s" % argv[i])
            flag.set_value(val)
        else:  # string
            if rhs is not None:
                val = rhs
            else:
                if i + 1 >= len(argv):
                    _fail("Could not find string value for flag %s" % lhs)
                i += 1
                val = argv[i]
            flag.set_value(val)
        i += 1

    if remove_flags:
        return [argv[0]] + argv[i:]
    return argv
