#!/bin/sh
# Build the reference C++ binaries at /tmp/ref as golden oracles for parity
# tests.  Safe to re-run; does nothing if binaries already exist.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF_SRC="${REF_SRC:-/root/reference}"
REF=/tmp/ref
if [ -x "$REF/primer_match" ] && [ -x "$REF/compress_seq" ] \
    && [ -x "$REF/atac_seq" ]; then
    exit 0
fi
[ -d "$REF_SRC" ] || { echo "no reference source at $REF_SRC" >&2; exit 1; }
rm -rf "$REF"
cp -r "$REF_SRC" "$REF"
mkdir -p /tmp/primegen
cp "$HERE/primegen_shim.h" /tmp/primegen/primegen.h
ar rcs /tmp/primegen/primegen.a
cd "$REF"
# -k: tandem_match.cc is bit-rotted (sortedvector::erase no longer exists)
# and must not abort the rest of the target list
make -k compress_seq primer_match exact_match inexact_match pcr_match \
     peptide_scan protein_mw peptide_mult polyrun nrdb \
     extract_seq aacomp aacomplookup genome_simulation atac_seq \
     solid_simulation \
     PGEN=/tmp/primegen PARAM=-DNOPRIMEGEN >/dev/null 2>&1 || true
# kmer_count clashes with std hash under modern g++; rename its local fns
if [ ! -x "$REF/kmer_count" ]; then
    sed 's/\bhash(/kc_hash(/g; s/\bhashrc(/kc_hashrc(/g; s/\bunhash(/kc_unhash(/g' \
        kmer_count.cc > kmer_count_fixed.cc
    g++ -O2 -I. -DNOPRIMEGEN -o kmer_count kmer_count_fixed.cc \
        mapFile.o bufferedFile.o fileStar.o char_io.o fasta_io.o util.o \
        types.o -lz >/dev/null 2>&1 || true
fi
# kmer_annotate has the same hash clash
if [ ! -x "$REF/kmer_annotate" ]; then
    sed 's/\bhash(/ka_hash(/g' kmer_annotate.cc > kmer_annotate_fixed.cc
    g++ -O2 -w -I. -o kmer_annotate kmer_annotate_fixed.cc \
        fasta_io.o util.o types.o >/dev/null 2>&1 || true
fi
# nrdb bit-rot: pattern_hit_vector values are pairs now; xmers: hash clash
OBJS="pattern_match.o keyword_tree.o shift_and.o mapFile.o bufferedFile.o \
fileStar.o char_io.o fasta_io.o util.o types.o pattern_alignment.o \
primer_alignment.o select.o shift_and_inexact.o exact_bases.o \
exact_halves.o filter_bitvec.o hash_table.o rand_hash_table.o \
gs_hash_table.o rlst.o sts_io.o"
if [ ! -x "$REF/nrdb" ]; then
    sed 's/it->value()->/it->value().first->/g' nrdb.cc > nrdb_fixed.cc
    g++ -O2 -I. -DNOPRIMEGEN -o nrdb nrdb_fixed.cc $OBJS -lz \
        >/dev/null 2>&1 || true
fi
if [ ! -x "$REF/xmers" ]; then
    sed 's/\bhash(/xm_hash(/g; s/\bhashrc(/xm_hashrc(/g; s/\bunhash(/xm_unhash(/g' \
        xmers.cc > xmers_fixed.cc
    # skip the minutes-long prime sieve when -H pins the table size; the
    # prime only picks internal bucket indices and never affects output
    perl -0pi -e 's/(std::vector<long unsigned int> primes\(1\);\n)(\s*)(rand_hash_table::random_primes_lt\(maxp,primes\);\n\s*long unsigned int prime = primes\[0\];)/$1$2long unsigned int prime = 0;\n$2if (opt.hashtablesize == -1) {\n$2rand_hash_table::random_primes_lt(maxp,primes);\n$2prime = primes[0];\n$2}/' xmers_fixed.cc
    g++ -O2 -I. -DNOPRIMEGEN -o xmers xmers_fixed.cc $OBJS \
        /tmp/primegen/primegen.a -lz >/dev/null 2>&1 || true
fi
# merstream is the same tool with an unsigned -u tag
if [ ! -x "$REF/merstream" ]; then
    sed 's/\bhash(/ms_hash(/g' merstream.cc > merstream_fixed.cc
    perl -0pi -e 's/(std::vector<long unsigned int> primes\(1\);\n)(\s*)(rand_hash_table::random_primes_lt\(maxp,primes\);\n\s*long unsigned int prime = primes\[0\];)/$1$2long unsigned int prime = 0;\n$2if (opt.hashtablesize == -1) {\n$2rand_hash_table::random_primes_lt(maxp,primes);\n$2prime = primes[0];\n$2}/' merstream_fixed.cc
    g++ -O2 -w -I. -DNOPRIMEGEN -o merstream merstream_fixed.cc $OBJS \
        /tmp/primegen/primegen.a -lz >/dev/null 2>&1 || true
fi
# allvall family: 'hash' clashes with std::hash; bitmap.h misses <algorithm>;
# allvall_dump uses C++17-forbidden bool++
if [ ! -x "$REF/allvall_merge" ]; then
    for f in hash.h hash.cc perfposht.h perfposht.cc allvall.cc \
             allvall_merge.cc allvall_dump.cc allvall_tobm.cc pairscan.cc \
             merstream.h merstream.cc; do
        [ -f "$f" ] && sed -i \
            's/\bclass hash\b/class av_hash/g; s/\bhash\b/av_hash/g; s/av_hash\.h/hash.h/g; s/av_hash\.cc/hash.cc/g; s/std::av_hash/std::hash/g' \
            "$f"
    done
    grep -q "<algorithm>" bitmap.h || sed -i '1a #include <algorithm>' bitmap.h
    sed -i 's/dir++/dir = !dir/; s/verbose++/verbose = true/' allvall_dump.cc
    make allvall allvall_merge allvall_dump allvall_tobm pairscan \
        PGEN=/tmp/primegen PARAM=-DNOPRIMEGEN >/dev/null 2>&1 || true
fi
# RL-stack tools miss <cstring>/<cstdlib> under modern g++; word_graph has
# the std::hash clash; trans_prob.h needs two-phase-lookup erase fixes and
# the external CS2 library (stubbed with aborting definitions — the
# solid_assembly code paths never reach the CS2 solver)
if [ ! -x "$REF/Indexer" ]; then
    for f in Indexer.cc IndexerAA.cc Xspace.cc XspaceLo.cc WordGraph.cc \
             solid_assembly.cc rl_suffix_tree.h; do
        [ -f "$f" ] && { grep -q "#include <cstring>" "$f" || \
            sed -i '1i #include <cstring>\n#include <cstdlib>' "$f"; }
    done
    sed -i 's/\bhash(/wg_hash(/g' word_graph.cc
    sed -i 's/erase(/this->erase(/g; s/this->this->erase(/this->erase(/g' \
        trans_prob.h
    mkdir -p /tmp/cs2stub
    cp "$HERE/cs2_stub.h" /tmp/cs2stub/CS2.h
    cp "$HERE/cs2_stub.cpp" /tmp/cs2stub/CS2.cpp
    (cd /tmp/cs2stub && g++ -c -O2 CS2.cpp -I. && ar rcs libCS2.a CS2.o)
    make Indexer IndexerAA Xspace XspaceLo WordGraph solid_assembly \
        CS2=/tmp/cs2stub PGEN=/tmp/primegen PARAM=-DNOPRIMEGEN \
        >/dev/null 2>&1 || true
fi
echo "reference oracles built at $REF"
