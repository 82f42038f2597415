"""`--device-build` CLI flag: file-level equality with the host build."""

import os

import pytest

from bonsai_tpu.cli import main
from bonsai_tpu.io import fastx
from bonsai_tpu.taxonomy.ncbi import accession_from_header

DATA = os.path.join(os.path.dirname(__file__), "data")
PHIX = os.path.join(DATA, "phix.fa")


@pytest.fixture(scope="module")
def taxfiles(tmp_path_factory):
    d = tmp_path_factory.mktemp("tax_dev")
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


def _db_content(path):
    from bonsai_tpu.db.formats import load_database

    db = load_database(path)
    return (
        db.table.keys_sorted.tobytes(),
        db.table.vals_sorted.tobytes(),
        db.k,
        db.w,
    )


def test_build_device_flag_matches_host(taxfiles):
    nodes, nameid, d = taxfiles
    host_db = os.path.join(d, "host.btpu")
    dev_db = os.path.join(d, "dev.btpu")
    base = [PHIX, "-k", "25", "-T", nodes, "-M", nameid]
    assert main(["build", host_db] + base) == 0
    assert main(["build", dev_db] + base + ["--device-build"]) == 0
    assert _db_content(host_db) == _db_content(dev_db)


def test_prebuild_device_flag_matches_host(taxfiles):
    nodes, nameid, d = taxfiles
    host_db = os.path.join(d, "host_p1.btpu")
    dev_db = os.path.join(d, "dev_p1.btpu")
    base = [nameid, nodes, None, PHIX, "-k", "21", "-f"]
    assert main(["prebuild"] + [base[0], base[1], host_db] + base[3:]) == 0
    assert (
        main(["prebuild"] + [base[0], base[1], dev_db] + base[3:]
             + ["--device-build"]) == 0
    )
    assert _db_content(host_db) == _db_content(dev_db)
