"""Runner for the reference's .reg regression suites
(/root/reference/test/regression.sh format) against our CLI.

Each line: ``P|F|INIT  expected-file  command...`` with ``$samtools``
replaced by our CLI and ``$fmt`` swept over formats.  Fixtures are copied
to a scratch dir (the reference tree is read-only); outputs are compared
byte-for-byte against expected/<file>.
"""

from __future__ import annotations

import os
import shlex
import shutil
import subprocess
import sys
from dataclasses import dataclass, field

SAMTOOLS = f"{sys.executable} -m samtools_tpu"


@dataclass
class RegResult:
    passed: list = field(default_factory=list)
    failed: list = field(default_factory=list)
    expected_fail: list = field(default_factory=list)
    skipped: list = field(default_factory=list)

    def summary(self) -> str:
        return (f"pass={len(self.passed)} fail={len(self.failed)} "
                f"xfail={len(self.expected_fail)} skip={len(self.skipped)}")


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(extra=None):
    env = dict(os.environ)
    env["SAMTPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def run_reg(reg_path: str, workdir: str, formats=("sam", "bam"),
            cmd_filter=None, skip_substrings=(), env_extra=None) -> RegResult:
    src_dir = os.path.dirname(os.path.abspath(reg_path))
    suite = os.path.basename(src_dir)
    root_dir = workdir
    workdir = os.path.join(workdir, suite)
    os.makedirs(workdir, exist_ok=True)
    for entry in os.listdir(src_dir):
        s = os.path.join(src_dir, entry)
        d = os.path.join(workdir, entry)
        if os.path.isfile(s) and not os.path.exists(d):
            shutil.copy(s, d)
        elif os.path.isdir(s) and not os.path.exists(d):
            shutil.copytree(s, d)
    # sibling fixture dir referenced as ../dat by some suites
    dat_src = os.path.join(os.path.dirname(src_dir), "dat")
    dat_dst = os.path.join(root_dir, "dat")
    if os.path.isdir(dat_src) and not os.path.exists(dat_dst):
        shutil.copytree(dat_src, dat_dst)
    for root, dirs, fns in os.walk(root_dir):
        for x in dirs:
            os.chmod(os.path.join(root, x), 0o755)
        for x in fns:
            os.chmod(os.path.join(root, x), 0o644)

    res = RegResult()
    env = _env(env_extra)
    # CRAM reference resolution via the suite's truncated-MD5 store
    # (regression.sh:33-34 exports REF_PATH=$pwd/md5)
    md5dir = os.path.join(workdir, "md5")
    if os.path.isdir(md5dir):
        env["REF_PATH"] = md5dir
    with open(reg_path) as f:
        lines = [l.rstrip("\n") for l in f]
    for line in lines:
        if not line or line.startswith("#"):
            continue
        parts = line.split(None, 2)
        if len(parts) < 3:
            continue
        kind, expected, cmd = parts
        if kind not in ("P", "F", "INIT"):
            continue
        fmts = formats if "$fmt" in cmd else (None,)
        for fmt in fmts:
            c = cmd.replace("$samtools", SAMTOOLS).replace("$awk", "awk")
            if fmt is not None:
                c = c.replace("$fmt", fmt)
            if any(s in c for s in skip_substrings):
                res.skipped.append(c)
                continue
            if cmd_filter and not cmd_filter(c):
                res.skipped.append(c)
                continue
            proc = subprocess.run(c, shell=True, cwd=workdir, env=env,
                                  capture_output=True)
            if kind == "INIT":
                if proc.returncode != 0:
                    res.failed.append((c, "INIT failed: "
                                       + proc.stderr.decode()[:500]))
                continue
            out = proc.stdout.replace(b"\r", b"")
            exp_path = os.path.join(workdir, "expected", expected)
            want = open(exp_path, "rb").read() if os.path.exists(exp_path) \
                else None
            ok = (proc.returncode == 0 and want is not None and out == want)
            if kind == "P":
                if ok:
                    res.passed.append(c)
                else:
                    reason = ("rc=%d" % proc.returncode if proc.returncode
                              else "output mismatch")
                    res.failed.append((c, reason, out[:2000],
                                       (want or b"")[:2000],
                                       proc.stderr.decode()[:500]))
            else:  # F: expected to differ
                if ok:
                    res.failed.append((c, "unexpected pass"))
                else:
                    res.expected_fail.append(c)
    return res
