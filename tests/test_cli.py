"""CLI smoke tests (in-process)."""

import os

import numpy as np
import pytest

from bonsai_tpu.cli import main
from bonsai_tpu.io import fastx
from bonsai_tpu.taxonomy.ncbi import accession_from_header

DATA = os.path.join(os.path.dirname(__file__), "data")
PHIX = os.path.join(DATA, "phix.fa")


@pytest.fixture(scope="module")
def taxfiles(tmp_path_factory):
    d = tmp_path_factory.mktemp("tax")
    nodes = d / "nodes.dmp"
    nodes.write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "13\t|\t2\t|\tspecies\t|\n"
    )
    nameid = d / "nameidmap.txt"
    acc = accession_from_header(fastx.first_header(PHIX))
    nameid.write_text(f"{acc}\t13\n")
    return str(nodes), str(nameid), str(d)


def test_build_and_classify_and_hist(taxfiles, capsys):
    nodes, nameid, d = taxfiles
    dbp = os.path.join(d, "phix.btpu")
    rc = main(["build", dbp, PHIX, "-k", "25", "-T", nodes, "-M", nameid])
    assert rc == 0
    # make some reads from phiX
    seq = b"".join(s for _, s, _ in fastx.read_fastx(PHIX))
    reads = os.path.join(d, "reads.fa")
    with open(reads, "w") as fh:
        for i in range(20):
            fh.write(f">read{i}\n{seq[i*37:(i*37)+90].decode()}\n")
    out = os.path.join(d, "out.tsv")
    rc = main(["classify", dbp, nodes, reads, "-o", out, "-a"])
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 20
    for line in lines:
        cols = line.split("\t")
        assert cols[0] == "C" and cols[2] == "13"
    rc = main(["hist", dbp])
    assert rc == 0
    cap = capsys.readouterr()
    assert "Name\tCount" in cap.out
    assert "\n13\t" in cap.out


def test_probe_image_cli(taxfiles, tmp_path):
    """`probe-image` on a .btpu bakes a classify-ready image dir that
    `classify` consumes byte-identically; on a sharded DB dir it bakes
    per-rank images that the sharded loader consumes transparently."""
    nodes, nameid, d = taxfiles
    dbp = os.path.join(d, "phix.btpu")
    if not os.path.exists(dbp):
        assert main(["build", dbp, PHIX, "-k", "25", "-T", nodes,
                     "-M", nameid]) == 0
    seq = b"".join(s for _, s, _ in fastx.read_fastx(PHIX))
    reads = str(tmp_path / "reads.fa")
    with open(reads, "w") as fh:
        for i in range(16):
            fh.write(f">r{i}\n{seq[i*53:(i*53)+90].decode()}\n")
    a = str(tmp_path / "a.tsv")
    assert main(["classify", dbp, nodes, reads, "-o", a, "-a"]) == 0
    img = str(tmp_path / "img")
    assert main(["probe-image", dbp, nodes, img]) == 0
    b = str(tmp_path / "b.tsv")
    assert main(["classify", img, nodes, reads, "-o", b, "-a"]) == 0
    assert open(a).read() == open(b).read()

    shd = str(tmp_path / "shards")
    assert main(["build", shd, PHIX, "-k", "25", "-T", nodes,
                 "-M", nameid, "--shards", "2"]) == 0
    assert main(["probe-image", shd, nodes]) == 0
    assert os.path.exists(
        [os.path.join(shd, f) for f in os.listdir(shd)
         if f.startswith("rankimg-")][0] + "/meta.json"
    )
    c = str(tmp_path / "c.tsv")
    assert main(["classify", shd, nodes, reads, "-o", c, "-a",
                 "--db-shards", "2"]) == 0
    assert open(a).read() == open(c).read()


def test_lca_cli(taxfiles, capsys):
    nodes, _, _ = taxfiles
    assert main(["lca", nodes, "13", "2"]) == 0
    assert capsys.readouterr().out.strip() == "2"


def test_bonsai_format_cli(taxfiles):
    nodes, nameid, d = taxfiles
    dbp = os.path.join(d, "phix.bonsaidb")
    rc = main(["build", dbp, PHIX, "-k", "25", "-T", nodes, "-M", nameid,
               "--bonsai-format"])
    assert rc == 0
    from bonsai_tpu.db.formats import import_bonsai_database

    db = import_bonsai_database(dbp)
    assert db.k == 25 and len(db.table) > 1000


def test_distmat_workflow(tmp_path):
    """run_dist.py + distmat2np.py equivalent: pairwise matrix over
    genomes, .npy + labeled .tsv outputs, exact and HLL-estimated."""
    import numpy as np
    from bonsai_tpu.cli import main

    g = [
        os.path.join(DATA, "golden", f)
        for f in ("g_phix.fa", "g_phixmut.fa", "g_rand.fa")
    ]
    if not all(os.path.exists(p) for p in g):
        import pytest

        pytest.skip("golden fixtures absent")
    out = str(tmp_path / "dm")
    assert main(["distmat", *g, "-k", "21", "-o", out]) == 0
    mat = np.load(out + ".npy")
    labels = open(out + ".labels.txt").read().split()
    assert mat.shape == (3, 3) and labels[0] == "g_phix.fa"
    assert np.allclose(mat, mat.T) and np.allclose(np.diag(mat), 1.0)
    # phix vs its 1%-mutated copy is far closer than vs random sequence
    assert mat[0, 1] > 0.2 > mat[0, 2]
    # mash distance flips the ordering (distance, not similarity)
    assert main(["distmat", *g, "-k", "21", "-o", out + "m",
                 "--metric", "mash"]) == 0
    dm = np.load(out + "m.npy")
    assert dm[0, 1] < dm[0, 2] and np.allclose(np.diag(dm), 0.0)
    # HLL-sketched estimate tracks the exact Jaccard
    assert main(["distmat", *g, "-k", "21", "-o", out + "h",
                 "--hll", "12"]) == 0
    hm = np.load(out + "h.npy")
    assert abs(hm[0, 1] - mat[0, 1]) < 0.1
