"""CLI driver tests: flag plumbing, dispatch order, parity through main().

The reference CLI quirks being checked are documented in cli.py and
SURVEY.md §8 (fof path resolution, -G auto-tune print, dump/load flow).
"""

import gzip

import pytest

from niqki_tpu import cli

import os

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/resources"),
    reason="reference resources not mounted")

FOF = "/root/reference/resources/file_of_file.txt"
FIXDIR = __file__.rsplit("/", 1)[0] + "/fixtures"


def test_logo_only(capsys):
    assert cli.main(["--logo"]) == 0
    out = capsys.readouterr().out
    assert "TPU-native" in out


def test_autotune_h_prints_choice(capsys, tmp_path):
    # SURVEY.md §2 C15: G=5e6, S=10 -> H=4 (verified against the reference).
    rc = cli.main(["-S", "10", "-G", "5000000",
                   "-O", str(tmp_path / "o.gz")])
    assert rc == 0
    assert "I chosed H=4" in capsys.readouterr().out


def test_matrix_via_cli_matches_golden(tmp_path, capsys):
    out = tmp_path / "m.gz"
    rc = cli.main(["-M", FOF, "-S", "10", "-O", str(out)])
    assert rc == 0
    got = gzip.open(out).read()
    want = gzip.open(FIXDIR + "/matrix_s10.gz").read()
    assert got == want


def test_index_dump_load_query_roundtrip(tmp_path, monkeypatch, capsys):
    dump = tmp_path / "idx.bin"
    rc = cli.main(["-I", FOF, "-S", "10", "-D", str(dump),
                   "-O", str(tmp_path / "none.gz")])
    assert rc == 0
    out = tmp_path / "hits.gz"
    # -Q resolves fof entries from the CWD (reference parity), so run from
    # the resources directory like the reference README workflow does.
    monkeypatch.chdir("/root/reference/resources")
    rc = cli.main(["-L", str(dump), "-Q", FOF, "-O", str(out)])
    assert rc == 0
    got = gzip.open(out).read()
    want = gzip.open(FIXDIR + "/hits_s10_j0.gz").read()
    assert got == want


def test_sharded_checkpoint_roundtrip(tmp_path, monkeypatch, capsys):
    ckpt = tmp_path / "ckpt"
    rc = cli.main(["-I", FOF, "-S", "10", "--save-sharded", str(ckpt),
                   "--shards", "3", "-O", str(tmp_path / "n1.gz")])
    assert rc == 0
    out = tmp_path / "hits.gz"
    # (-M on a loaded index re-inserts its fof, reference parity — so the
    # pure-roundtrip check queries instead.)
    monkeypatch.chdir("/root/reference/resources")
    rc = cli.main(["--load-sharded", str(ckpt), "-Q", FOF, "-O", str(out)])
    assert rc == 0
    got = gzip.open(out).read()
    want = gzip.open(FIXDIR + "/hits_s10_j0.gz").read()
    assert got == want


def test_query_fof_resolves_from_cwd(tmp_path, monkeypatch, capsys):
    # -Q fofs resolve entries from the CWD (not the fof's directory).
    fof = tmp_path / "q.txt"
    fof.write_text("ecoli01p.fa.gz\n")
    monkeypatch.chdir("/root/reference/resources")
    out = tmp_path / "h.gz"
    rc = cli.main(["-I", FOF, "-S", "10", "-Q", str(fof), "-O", str(out)])
    assert rc == 0
    lines = gzip.open(out).read().decode().splitlines()
    assert len(lines) == 1 and lines[0].startswith("ecoli01p.fa.gz ")


def test_autotune_matrix_golden(tmp_path, monkeypatch, capsys):
    """-G quirk parity: select_best_H updates only H and the M shift; the
    stale mask_M/maximal_remainder must flow into every fingerprint
    (fixture: reference binary, -M -S 10 -G 1e8 -> H=5)."""
    out = tmp_path / "m.gz"
    rc = cli.main(["-M", FOF, "-S", "10", "-G", "100000000",
                   "-O", str(out)])
    assert rc == 0
    assert "I chosed H=5" in capsys.readouterr().out
    assert gzip.open(out).read() == \
        gzip.open(FIXDIR + "/matrix_s10_g1e8.gz").read()


def test_load_then_matrix_reindexes_fof(tmp_path, capsys):
    """-L + -M parity: the reference inserts the matrix fof into the loaded
    index (its condition checks only -I/-i), doubling the genome set."""
    dump = tmp_path / "d.bin"
    rc = cli.main(["-I", FOF, "-S", "10", "-D", str(dump),
                   "-O", str(tmp_path / "n.gz")])
    assert rc == 0
    out = tmp_path / "m.gz"
    rc = cli.main(["-L", str(dump), "-M", FOF, "-O", str(out)])
    assert rc == 0
    assert gzip.open(out).read() == \
        gzip.open(FIXDIR + "/matrix_s10_loadM.gz").read()


def test_load_ignores_minjac(tmp_path, monkeypatch, capsys):
    """-L parity: min_score comes from the dump; -J on the command line is
    ignored (fixture dump was built with -J 0.9)."""
    monkeypatch.chdir("/root/reference/resources")
    out = tmp_path / "h.gz"
    rc = cli.main(["-L", FIXDIR + "/dump_s10_j09.bin", "-Q", FOF,
                   "-J", "0", "-O", str(out)])
    assert rc == 0
    assert gzip.open(out).read() == \
        gzip.open(FIXDIR + "/hits_s10_loadJ09.gz").read()


def test_matrix_s16_uint16_wrap(tmp_path, capsys):
    """lF >= 16 parity: the reference's matrix counters are uint16, so a
    genome's self-count of F=65536 wraps to 0 (fixture from the reference
    binary at -S 16 -K 21 on the tiny genomes)."""
    out = tmp_path / "m.gz"
    rc = cli.main(["-M", FIXDIR + "/fof_tiny.txt", "-S", "16", "-K", "21",
                   "-O", str(out)])
    assert rc == 0
    got = gzip.open(out).read()
    assert b"\t0\t" in got or got.split(b"\n")[1].split(b"\t")[1] == b"0"
    assert got == gzip.open(FIXDIR + "/matrix_s16_tiny.gz").read()
