"""samtools tview golden test (reference test.pl:test_large_positions,
/root/reference/test/test.pl:2909-2911)."""

import os
import subprocess
import sys

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, columns="80"):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO, COLUMNS=columns)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout


def test_tview_text_large_pos():
    rc, out = run_cli(["tview", "-d", "T", "-p",
                       "CHROMOSOME_I:10000000000",
                       f"{R}/large_pos/longref.sam"])
    assert rc == 0
    want = open(f"{R}/large_pos/tview.expected.out", "rb").read()
    assert out == want


def test_tview_text_with_reference(tmp_path):
    import shutil
    sam = f"{tmp_path}/toy.sam"
    fa = f"{tmp_path}/toy.fa"
    shutil.copy("/root/reference/examples/toy.sam", sam)
    shutil.copy("/root/reference/examples/toy.fa", fa)
    rc, out = run_cli(["tview", "-d", "T", "-p", "ref:1", sam, fa],
                      columns="60")
    assert rc == 0
    lines = out.decode().splitlines()
    # scale, reference, consensus, then read rows
    assert lines[0].startswith("1")
    assert lines[1].startswith("AGCATGTTAGATAA")
    assert len(lines) >= 5
    # matching bases render as ./, on fwd/rev strands
    assert "." in lines[3] or "," in lines[3]


def test_tview_html_mode():
    rc, out = run_cli(["tview", "-d", "H", "-p",
                       "CHROMOSOME_I:10000000000",
                       f"{R}/large_pos/longref.sam"])
    assert rc == 0
    assert out.startswith(b"<html><head><title>CHROMOSOME_I:10000000000")
    assert out.rstrip().endswith(b"</pre></div></body></html>")


def test_tview_width_option():
    rc, out = run_cli(["tview", "-d", "T", "-w", "40", "-p",
                       "CHROMOSOME_I:10000000000",
                       f"{R}/large_pos/longref.sam"])
    assert rc == 0
    for line in out.decode().splitlines():
        assert len(line) == 40


def test_tview_curses_interactive():
    """Drive the curses backend (bam_tview_curses.c analog) in a pty:
    draw at a region, open help, goto another region, quit."""
    import pty
    import select
    import time

    pid, fd = pty.fork()
    if pid == 0:
        os.environ["TERM"] = "xterm"
        os.environ["SAMTPU_PLATFORM"] = "cpu"
        os.execvp(sys.executable, [
            sys.executable, "-m", "samtools_tpu", "tview", "-d", "C",
            "-p", "17:100", f"{R}/mpileup/mpileup.1.bam",
            f"{R}/mpileup/mpileup.ref.fa"])
    out = b""

    def drain(t):
        nonlocal out
        end = time.time() + t
        while time.time() < end:
            r, _, _ = select.select([fd], [], [], 0.2)
            if r:
                try:
                    d = os.read(fd, 65536)
                except OSError:
                    return
                if not d:
                    return
                out += d

    drain(10)
    for k in [b"l", b"?", b" ", b"g", b"17:300\r"]:
        os.write(fd, k)
        drain(0.5)
    os.write(fd, b"q")
    drain(2)
    _, status = os.waitpid(pid, 0)
    text = out.decode("latin-1", "replace")
    assert "-=-    Help    -=-" in text
    assert "Goto:" in text
    assert "301" in text          # ruler after goto 17:300
    assert os.waitstatus_to_exitcode(status) == 0
