"""Offline tests of the RefSeq fetcher's parsing/selection/layout logic."""

import gzip
import io
import os

from bonsai_tpu.scripts import download_genomes as dg

SUMMARY = """#   See assembly summary file format
# assembly_accession\tbioproject\tbiosample\twgs_master\trefseq_category\ttaxid\tspecies_taxid\torganism_name\tinfraspecific_name\tisolate\tversion_status\tassembly_level\trelease_type\tgenome_rep\tseq_rel_date\tasm_name\tsubmitter\tgbrs_paired_asm\tpaired_asm_comp\tftp_path\texcluded_from_refseq\trelation_to_type_material
GCF_000005845.2\tPRJNA57779\tSAMN02604091\t\treference genome\t511145\t562\tEscherichia coli K-12\t\t\tlatest\tComplete Genome\tMajor\tFull\t2013/09/26\tASM584v2\tUniv\tGCA_000005845.2\tidentical\tftp://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/005/845/GCF_000005845.2_ASM584v2\t\t
GCF_000008865.1\tPRJNA57781\tSAMN02604092\t\tna\t386585\t562\tEscherichia coli O157\t\t\tlatest\tScaffold\tMajor\tFull\t2013/09/26\tASM886v1\tUniv\tGCA_000008865.1\tidentical\tftp://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/008/865/GCF_000008865.1_ASM886v1\t\t
GCF_BAD\tx\tx\t\tna\tnotanint\t1\tBroken\t\t\tlatest\tComplete Genome\tMajor\tFull\t2013\tX\tY\tZ\tidentical\tftp://example/x\t\t
GCF_NOFTP\tx\tx\t\tna\t5\t5\tNoFtp\t\t\tlatest\tComplete Genome\tMajor\tFull\t2013\tX\tY\tZ\tidentical\tna\t\t
"""


def test_parse_and_select():
    asm = dg.parse_assembly_summary(io.StringIO(SUMMARY))
    assert len(asm) == 2  # bad taxid and missing ftp dropped
    a = asm[0]
    assert a.accession == "GCF_000005845.2"
    assert a.taxid == 511145 and a.species_taxid == 562
    assert a.ftp_path.startswith("https://")
    assert a.fna_url.endswith(
        "GCF_000005845.2_ASM584v2/GCF_000005845.2_ASM584v2_genomic.fna.gz"
    )
    sel = dg.select_assemblies(asm)
    assert [x.accession for x in sel] == ["GCF_000005845.2"]
    rep = dg.select_assemblies(asm, complete_only=False,
                               representative_only=True)
    assert [x.accession for x in rep] == ["GCF_000005845.2"]


def test_nameidmap_and_gzip_check(tmp_path):
    asm = dg.select_assemblies(dg.parse_assembly_summary(io.StringIO(SUMMARY)))
    nm = tmp_path / "nameidmap.txt"
    dg.write_nameidmap(asm, str(nm))
    assert nm.read_text() == "GCF_000005845.2\t511145\n"
    good = tmp_path / "ok.gz"
    with gzip.open(good, "wb") as fh:
        fh.write(b"ACGT" * 1000)
    assert dg.is_valid_gzip(str(good))
    bad = tmp_path / "bad.gz"
    bad.write_bytes(b"\x1f\x8b" + b"garbage")
    assert not dg.is_valid_gzip(str(bad))


def test_summary_url():
    assert dg.summary_url("bacteria").endswith(
        "refseq/bacteria/assembly_summary.txt"
    )
