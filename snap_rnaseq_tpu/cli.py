"""snap-rna-tpu command line.

Analog of reference apps/snap/Main.cpp:42-86 + AlignerOptions.cpp: one
binary, four subcommands —

  index         <ref.fa> <index-dir> [-s seedLen] [-lf loadFactor]
  transcriptome <annotation.gtf> <ref.fa> <index-dir> [-s seedLen]
  single        <genome-dir> [<transcriptome-dir> <annotation>] <input.fq[.gz]> -o out.sam [...]
  paired        <genome-dir> [<transcriptome-dir> <annotation>] <r1.fq> <r2.fq> -o out.sam [...]

Flag names follow the reference where they exist (-d maxDist, -n seeds,
-h maxHits, -e wgsim error oracle, -C clipping, -M useM, -rg read group).
Unlike the reference, the transcriptome-dir/annotation pair is optional:
genome-only alignment is a first-class mode here.
"""
from __future__ import annotations

import argparse
import sys
import time


def _add_align_flags(p: argparse.ArgumentParser, paired: bool):
    from .constants import PAIRED_DEFAULTS, SINGLE_DEFAULTS
    d = PAIRED_DEFAULTS if paired else SINGLE_DEFAULTS
    p.add_argument("-o", dest="output", required=True,
                   help="output path (.sam, .sam.gz, or .bam)")
    p.add_argument("-so", dest="sorted_output", action="store_true",
                   help="sort output by alignment location")
    p.add_argument("-d", dest="max_dist", type=int, default=d["max_dist"],
                   help="maximum edit distance")
    p.add_argument("-n", dest="num_seeds", type=int, default=d["num_seeds"],
                   help="number of seeds to apply per read")
    p.add_argument("-h", dest="max_hits", type=int, default=d["max_hits"],
                   help="maximum hits per seed before it is skipped")
    p.add_argument("-e", dest="compute_error", action="store_true",
                   help="compute error rate assuming wgsim-generated reads")
    p.add_argument("-D", dest="extra_search_depth", type=int, default=2)
    p.add_argument("-M", dest="use_m", action="store_true",
                   help="use M in CIGAR instead of =/X")
    p.add_argument("-C", dest="clipping", default="++",
                   help="clipping: ++ front+back, x+ back only, +x front only, xx none")
    p.add_argument("-rg", dest="read_group", default="FASTQ")
    p.add_argument("-b", dest="batch_size", type=int, default=256)
    p.add_argument("--help", action="help")
    if paired:
        p.add_argument("-s", dest="spacing", type=int, nargs=2,
                       default=[d["min_spacing"], d["max_spacing"]],
                       help="min and max spacing for paired ends")


def _clip_mode(s: str) -> int:
    from .io.reads import CLIP_BACK, CLIP_FRONT, CLIP_FRONT_AND_BACK, NO_CLIPPING
    return {"++": CLIP_FRONT_AND_BACK, "x+": CLIP_BACK,
            "+x": CLIP_FRONT, "xx": NO_CLIPPING}.get(s, CLIP_FRONT_AND_BACK)


def cmd_index(argv):
    p = argparse.ArgumentParser(prog="snap-rna-tpu index", add_help=True)
    p.add_argument("fasta")
    p.add_argument("directory")
    p.add_argument("-s", dest="seed_len", type=int, default=20)
    p.add_argument("-lf", dest="load_factor", type=float, default=0.7)
    p.add_argument("-hg19", action="store_true",
                   help="accepted for reference compatibility (bias tables are "
                        "unnecessary here: shard sizes come from exact counts)")
    a = p.parse_args(argv)
    from .index.genome import read_fasta_genome
    from .index.hash_index import build_index
    t0 = time.time()
    genome = read_fasta_genome(a.fasta)
    idx = build_index(genome, a.seed_len, load_factor=a.load_factor, verbose=True)
    idx.save(a.directory)
    dt = time.time() - t0
    print(f"indexed {genome.num_bases:,} bases in {dt:.1f}s "
          f"({genome.num_bases / max(dt, 1e-9):,.0f} bases/s)")
    return 0


def cmd_transcriptome(argv):
    p = argparse.ArgumentParser(prog="snap-rna-tpu transcriptome")
    p.add_argument("gtf")
    p.add_argument("fasta")
    p.add_argument("directory")
    p.add_argument("-s", dest="seed_len", type=int, default=20)
    a = p.parse_args(argv)
    from .index.genome import read_fasta_genome
    from .index.hash_index import build_index
    from .rna.gtf import GTFReader
    from .rna.transcriptome import build_transcriptome_genome
    t0 = time.time()
    genome = read_fasta_genome(a.fasta)
    gtf = GTFReader.load(a.gtf)
    tgenome = build_transcriptome_genome(gtf, genome)
    idx = build_index(tgenome, a.seed_len)
    idx.save(a.directory)
    gtf.save_cache(a.directory)
    print(f"transcriptome: {tgenome.num_pieces} transcripts, "
          f"{tgenome.num_bases:,} bases in {time.time() - t0:.1f}s")
    return 0


def _positional_split(args):
    """Split positionals from flags (reference-style fixed positionals)."""
    pos, rest = [], []
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        if args[i].startswith("-"):
            rest = args[i:]
            break
        pos.append(args[i])
        i += 1
    return pos, rest


def cmd_single(argv):
    pos, flags = _positional_split(argv)
    p = argparse.ArgumentParser(prog="snap-rna-tpu single", add_help=False)
    _add_align_flags(p, paired=False)
    a = p.parse_args(flags)

    from .index.hash_index import GenomeIndex
    from .models.pipeline import PipelineOptions, SingleEndPipeline

    if len(pos) == 2:
        genome_dir, fastq = pos
        transcriptome_dir = annotation = None
    elif len(pos) == 4:
        genome_dir, transcriptome_dir, annotation, fastq = pos
    else:
        print("usage: snap-rna-tpu single <genome-dir> "
              "[<transcriptome-dir> <annotation>] <input.fq[.gz]> -o out.sam",
              file=sys.stderr)
        return 2

    index = GenomeIndex.load(genome_dir)
    opt = PipelineOptions(batch_size=a.batch_size, use_m=a.use_m,
                          read_group=a.read_group, clipping=_clip_mode(a.clipping),
                          compute_error=a.compute_error,
                          sorted_output=a.sorted_output)
    cmdline = "snap-rna-tpu single " + " ".join(pos + flags)
    if transcriptome_dir is None:
        pipe = SingleEndPipeline(index, options=opt, max_k=a.max_dist,
                                 num_seeds=a.num_seeds, max_hits=a.max_hits,
                                 extra_search_depth=a.extra_search_depth)
        stats = pipe.run(fastq, a.output, command_line=cmdline)
    else:
        from .rna.pipeline import RnaSingleEndPipeline
        pipe = RnaSingleEndPipeline(genome_dir, transcriptome_dir, annotation,
                                    options=opt, max_k=a.max_dist,
                                    num_seeds=a.num_seeds, max_hits=a.max_hits)
        stats = pipe.run(fastq, a.output, command_line=cmdline)
    print(stats.summary())
    if a.compute_error:
        print(stats.roc_table())
    return 0


def cmd_paired(argv):
    pos, flags = _positional_split(argv)
    p = argparse.ArgumentParser(prog="snap-rna-tpu paired", add_help=False)
    _add_align_flags(p, paired=True)
    a = p.parse_args(flags)

    from .index.hash_index import GenomeIndex
    from .models.paired_pipeline import PairedEndPipeline, PairedPipelineOptions

    if len(pos) == 3:
        genome_dir, fq1, fq2 = pos
        transcriptome_dir = annotation = None
    elif len(pos) == 5:
        genome_dir, transcriptome_dir, annotation, fq1, fq2 = pos
    else:
        print("usage: snap-rna-tpu paired <genome-dir> "
              "[<transcriptome-dir> <annotation>] <r1.fq> <r2.fq> -o out.sam",
              file=sys.stderr)
        return 2

    index = GenomeIndex.load(genome_dir)
    opt = PairedPipelineOptions(
        batch_size=a.batch_size, use_m=a.use_m, read_group=a.read_group,
        clipping=_clip_mode(a.clipping), compute_error=a.compute_error,
        min_spacing=a.spacing[0], max_spacing=a.spacing[1],
        sorted_output=a.sorted_output)
    cmdline = "snap-rna-tpu paired " + " ".join(pos + flags)
    if transcriptome_dir is None:
        pipe = PairedEndPipeline(index, options=opt, max_k=a.max_dist,
                                 num_seeds=a.num_seeds, max_hits=a.max_hits)
        stats = pipe.run(fq1, fq2, a.output, command_line=cmdline)
    else:
        from .rna.pipeline import RnaPairedEndPipeline
        pipe = RnaPairedEndPipeline(genome_dir, transcriptome_dir, annotation,
                                    options=opt, max_k=a.max_dist,
                                    num_seeds=a.num_seeds, max_hits=a.max_hits)
        stats = pipe.run(fq1, fq2, a.output, command_line=cmdline)
    print(stats.summary())
    return 0


def main(argv=None):
    from .utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: snap-rna-tpu {index|transcriptome|single|paired} ...",
              file=sys.stderr)
        return 2
    cmd, rest = argv[0], argv[1:]
    try:
        handler = {"index": cmd_index, "transcriptome": cmd_transcriptome,
                   "single": cmd_single, "paired": cmd_paired}[cmd]
    except KeyError:
        print(f"unknown subcommand {cmd!r}", file=sys.stderr)
        return 2
    return handler(rest)


if __name__ == "__main__":
    sys.exit(main())
