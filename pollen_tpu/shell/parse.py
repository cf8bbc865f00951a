"""Shell front end: POSIX-ish command lines -> dataflow IR.

Reference semantics: flatgfa-sh/src/parse.rs. Quoting/escaping is
handled by :mod:`shlex`; pipelines wire fresh pipe resources between
stages; ``<``/``>`` redirections rebind a stage's endpoints. Recognized
commands (``odgi depth``, ``bedtools makewindows``, ``gunzip``) lower to
in-process ops; anything else becomes an ``exec`` passthrough.

Accepted grammar note: the reference lexes with a full shell parser
(brush-parser) but its translator REJECTS everything beyond simple
commands, pipelines, ``;`` sequencing, and file redirections —
``&&``/``||`` and ``&`` hit explicit unimplemented!() arms
(parse.rs:195-209), and words expand no variables (parse.rs:238-251).
This front end accepts exactly that same language and raises the same
rejections, just as parse errors instead of panics.
"""

from __future__ import annotations

import shlex
from typing import List, Optional, Tuple

from . import ir
from .ir import Program, Resource


class ShellParseError(ValueError):
    pass


def _split_statements(tokens: List[str]) -> List[List[str]]:
    out: List[List[str]] = [[]]
    for tok in tokens:
        if tok in ("&&", "||"):
            # Match the reference's explicit rejection
            # (parse.rs:205 "&& and || not supported").
            raise ShellParseError(f"{tok} is not supported")
        if tok == "&":
            raise ShellParseError("async commands are not supported")
        if tok in (";", "\n"):
            if out[-1]:
                out.append([])
        else:
            out[-1].append(tok)
    return [s for s in out if s]


def _split_pipeline(tokens: List[str]) -> List[List[str]]:
    stages: List[List[str]] = [[]]
    for tok in tokens:
        if tok == "|":
            stages.append([])
        else:
            stages[-1].append(tok)
    if any(not s for s in stages):
        raise ShellParseError("empty pipeline stage")
    return stages


def _pop_redirects(
    prog: Program, tokens: List[str], src: Resource, dst: Resource
) -> Tuple[List[str], Resource, Resource]:
    args: List[str] = []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok in ("<", ">"):
            if i + 1 >= len(tokens):
                raise ShellParseError(f"missing target for {tok!r}")
            target = prog.file(tokens[i + 1])
            if tok == "<":
                src = target
            else:
                dst = target
            i += 2
        elif tok.startswith(">") and len(tok) > 1:
            dst = prog.file(tok[1:])
            i += 1
        elif tok.startswith("<") and len(tok) > 1:
            src = prog.file(tok[1:])
            i += 1
        else:
            args.append(tok)
            i += 1
    return args, src, dst


def _flag_value(args: List[str], *names: str) -> Optional[str]:
    for name in names:
        if name in args:
            i = args.index(name)
            if i + 1 >= len(args):
                raise ShellParseError(f"missing value for {name}")
            args.pop(i)
            return args.pop(i)
    return None


def _translate_odgi(
    prog: Program, args: List[str], src: Resource, dst: Resource
) -> None:
    args = list(args)
    in_file = _flag_value(args, "-i", "--input")
    if in_file is not None:
        src = prog.file(in_file)
    gfa = prog.load_gfa(src)

    if not args:
        raise ShellParseError("odgi: missing subcommand")
    sub = args.pop(0)
    if sub == "paths":
        if "-L" in args:
            args.remove("-L")
        prog.instr([gfa], dst, ir.PATHS)
        return
    if sub != "depth":
        raise ShellParseError(f"unsupported odgi subcommand {sub!r}")

    if "-d" in args:
        args.remove("-d")
        prog.instr([gfa], dst, ir.NODE_DEPTH)
        return
    bed_file = _flag_value(args, "-b")
    if bed_file is not None:
        bed = prog.load_bed(prog.file(bed_file))
        prog.instr([gfa, bed], dst, ir.INTERVAL_DEPTH)
        return
    prog.instr([gfa], dst, ir.PATH_DEPTH, path=_flag_value(args, "-r"))


def _translate_bedtools(
    prog: Program, args: List[str], src: Resource, dst: Resource
) -> None:
    args = list(args)
    if not args or args.pop(0) != "makewindows":
        raise ShellParseError("unsupported bedtools subcommand")
    bed_file = _flag_value(args, "-b")
    if bed_file is None:
        raise ShellParseError("bedtools makewindows needs -b")
    size = _flag_value(args, "-w")
    if size is None:
        raise ShellParseError("bedtools makewindows needs -w")
    bed_src = src if bed_file == "/dev/stdin" else prog.file(bed_file)
    bed = prog.load_bed(bed_src)
    prog.instr([bed], dst, ir.MAKE_WINDOWS, size=int(size))


def _translate_command(
    prog: Program, tokens: List[str], src: Resource, dst: Resource
) -> None:
    args, src, dst = _pop_redirects(prog, tokens[1:], src, dst)
    name = tokens[0]
    if name == "odgi":
        _translate_odgi(prog, args, src, dst)
    elif name == "bedtools":
        _translate_bedtools(prog, args, src, dst)
    elif name == "gunzip":
        if args:
            raise ShellParseError("no gunzip arguments are supported")
        prog.instr([src], dst, ir.GZIP_DECOMPRESS)
    else:
        prog.instr([src], dst, ir.EXEC, command=name, args=tuple(args))


def shell_to_ir(text: str) -> Program:
    """Parse shell text into an IR program."""
    # Lex line by line: shlex's whitespace_split treats newlines as
    # plain whitespace, which would fuse a script's statements into
    # one. A ";" after each line keeps the statement boundaries.
    tokens: List[str] = []
    for line in text.splitlines():
        lex = shlex.shlex(line, posix=True, punctuation_chars="|;<>&")
        lex.whitespace_split = True
        tokens.extend(lex)
        tokens.append(";")
    prog = Program()
    for statement in _split_statements(tokens):
        stages = _split_pipeline(statement)
        src = ir.STDIN_R
        for i, stage in enumerate(stages):
            dst = (
                ir.STDOUT_R
                if i == len(stages) - 1
                else prog.fresh(ir.PIPE)
            )
            _translate_command(prog, stage, src, dst)
            src = dst
    return prog
