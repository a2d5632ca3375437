// Differential test + microbenchmark for csrc/kvq_fast_inflate.h
// against zlib's inflate.  Build & run:
//   g++ -O2 -g -march=x86-64-v3 tools/fast_inflate_test.cpp -lz \
//       -o /tmp/fi_test && /tmp/fi_test [bench_file.gz]
// (tests/test_fast_inflate.py builds and runs this, including an
// ASan/UBSan variant)
//
// Correctness matrix: payload shapes (FastQ-like, text runs, random
// binary, zeros, empty) x zlib levels (0 = stored, 1, 6, 9) x header
// variants (plain, FNAME+FEXTRA+FCOMMENT+FHCRC) x multi-member concat,
// each decoded through the window-maintaining chunk loop the reader's
// ring producer uses, at chunk sizes 333 / 4 KiB / 1 MiB.  Also:
// truncation at every 1/8th boundary must end silently with a prefix of
// the full output, and random single-byte corruptions must produce an
// error or a clean end -- never a crash or an undetected wrong CRC.

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <random>
#include <string>
#include <vector>

#include <zlib.h>

#include "../csrc/kvq_fast_inflate.h"

using kvq_fast::Decoder;

static std::vector<uint8_t> gzip_compress(const std::vector<uint8_t>& in,
                                          int level, bool fancy_header) {
    z_stream zs;
    std::memset(&zs, 0, sizeof zs);
    int ret = deflateInit2(&zs, level, Z_DEFLATED, 16 + MAX_WBITS, 8,
                           Z_DEFAULT_STRATEGY);
    assert(ret == Z_OK);
    gz_header hdr;
    std::memset(&hdr, 0, sizeof hdr);
    static uint8_t extra[5] = {1, 2, 3, 4, 5};
    if (fancy_header) {
        hdr.name = (Bytef*)"some file name";
        hdr.comment = (Bytef*)"a comment";
        hdr.extra = extra;
        hdr.extra_len = 5;
        hdr.hcrc = 1;
        deflateSetHeader(&zs, &hdr);
    }
    std::vector<uint8_t> out(deflateBound(&zs, (uLong)in.size()) + 64);
    zs.next_in = (Bytef*)in.data();
    zs.avail_in = (uInt)in.size();
    zs.next_out = out.data();
    zs.avail_out = (uInt)out.size();
    ret = deflate(&zs, Z_FINISH);
    assert(ret == Z_STREAM_END);
    out.resize(out.size() - zs.avail_out);
    deflateEnd(&zs);
    return out;
}

// decode with the fast decoder through the ring-producer-style window
// loop; returns 0 ok (clean end or silent truncation), -1 error
static int fast_decode(const std::vector<uint8_t>& comp,
                       std::vector<uint8_t>* out, size_t chunk,
                       std::string* err, bool* truncated = nullptr) {
    static Decoder d;                   // big tables; reuse
    d.init(comp.data(), comp.size());
    const size_t WIN = 1u << 15;
    std::vector<uint8_t> buf(WIN + chunk);
    size_t hist = 0;
    out->clear();
    for (;;) {
        long n = kvq_fast::decode_some(&d, buf.data() + WIN, chunk, hist);
        if (n < 0) {
            *err = d.msg ? d.msg : "?";
            return -1;
        }
        if (n > 0) {
            out->insert(out->end(), buf.begin() + WIN,
                        buf.begin() + WIN + n);
            // maintain the 32 KB window before the chunk area
            size_t keep = (size_t)n + hist;
            if (keep > WIN) keep = WIN;
            std::memmove(buf.data() + WIN - keep,
                         buf.data() + WIN + n - keep, keep);
            hist = keep;
        }
        if (d.phase == kvq_fast::PH_DONE
                || d.phase == kvq_fast::PH_TRUNC) {
            if (truncated)
                *truncated = d.phase == kvq_fast::PH_TRUNC;
            return 0;
        }
        if (d.phase == kvq_fast::PH_ERR) {
            // errors deliver their valid prefix first, then report
            *err = d.msg ? d.msg : "?";
            return -1;
        }
        if (n == 0) {
            *err = "no progress";
            return -1;
        }
    }
}

static std::vector<uint8_t> make_fastq(size_t n_reads, std::mt19937* rng) {
    std::vector<uint8_t> out;
    const char* bases = "ACGT";
    char line[512];
    for (size_t i = 0; i < n_reads; i++) {
        int rl = 80 + (int)((*rng)() % 60);
        int n = std::snprintf(line, sizeof line, "@read%zu xyz\n",
                              i);
        out.insert(out.end(), line, line + n);
        for (int j = 0; j < rl; j++)
            out.push_back((uint8_t)bases[(*rng)() & 3]);
        out.push_back('\n');
        out.push_back('+');
        out.push_back('\n');
        for (int j = 0; j < rl; j++)
            out.push_back((*rng)() % 10 ? 'I' : '#');
        out.push_back('\n');
    }
    return out;
}

static int failures = 0;
#define CHECK(cond, what) do { if (!(cond)) { \
    std::fprintf(stderr, "FAIL %s (line %d)\n", what, __LINE__); \
    failures++; } } while (0)

static void run_matrix() {
    std::mt19937 rng(20260821);

    std::vector<std::pair<const char*, std::vector<uint8_t>>> payloads;
    payloads.emplace_back("fastq", make_fastq(4000, &rng));
    {
        std::vector<uint8_t> text;
        for (int i = 0; i < 120000; i++)
            text.push_back((uint8_t)("the quick brown fox "[i % 20]));
        payloads.emplace_back("text-runs", text);
    }
    {
        std::vector<uint8_t> rnd(300000);
        for (auto& b : rnd) b = (uint8_t)rng();
        payloads.emplace_back("random", rnd);   // mostly stored blocks
    }
    payloads.emplace_back("zeros", std::vector<uint8_t>(200000, 0));
    payloads.emplace_back("empty", std::vector<uint8_t>());
    {
        std::vector<uint8_t> one(1, 'x');
        payloads.emplace_back("one-byte", one);
    }

    const int levels[] = {0, 1, 6, 9};
    const size_t chunks[] = {333, 4096, 1u << 20};

    for (auto& pl : payloads) {
        for (int level : levels) {
            for (int fancy = 0; fancy < 2; fancy++) {
                std::vector<uint8_t> comp =
                    gzip_compress(pl.second, level, fancy != 0);
                for (size_t chunk : chunks) {
                    std::vector<uint8_t> got;
                    std::string err;
                    int rc = fast_decode(comp, &got, chunk, &err);
                    CHECK(rc == 0, pl.first);
                    CHECK(got == pl.second, pl.first);
                }
                // multi-member: payload twice in one file
                std::vector<uint8_t> two = comp;
                two.insert(two.end(), comp.begin(), comp.end());
                std::vector<uint8_t> want = pl.second;
                want.insert(want.end(), pl.second.begin(),
                            pl.second.end());
                std::vector<uint8_t> got;
                std::string err;
                int rc = fast_decode(two, &got, 4096, &err);
                CHECK(rc == 0, "multi-member");
                CHECK(got == want, "multi-member");
            }
        }
    }

    // truncation: silent end with a prefix of the full output
    {
        std::vector<uint8_t> payload = make_fastq(2000, &rng);
        std::vector<uint8_t> comp = gzip_compress(payload, 6, false);
        for (int k = 1; k < 8; k++) {
            std::vector<uint8_t> cut(comp.begin(),
                                     comp.begin()
                                     + comp.size() * k / 8);
            std::vector<uint8_t> got;
            std::string err;
            bool trunc = false;
            int rc = fast_decode(cut, &got, 4096, &err, &trunc);
            CHECK(rc == 0, "truncated");
            CHECK(trunc || got.size() == payload.size(), "trunc flag");
            CHECK(got.size() <= payload.size(), "truncated size");
            CHECK(std::memcmp(got.data(), payload.data(),
                              got.size()) == 0, "truncated prefix");
        }
    }

    // truncation at EVERY byte boundary must end silently -- never a
    // data error: a zero-padded partial code can index an unassigned
    // (e.g. RFC-reserved fixed-code) table pattern, which is only a
    // definite error when all its bits are really present.  Covers
    // stored (level 0), fixed (Z_FIXED) and dynamic blocks.
    {
        std::vector<uint8_t> payload = make_fastq(60, &rng);
        std::vector<std::vector<uint8_t>> comps;
        comps.push_back(gzip_compress(payload, 0, false));
        comps.push_back(gzip_compress(payload, 6, false));
        {   // fixed-Huffman member (deflate strategy Z_FIXED)
            z_stream zs;
            std::memset(&zs, 0, sizeof zs);
            deflateInit2(&zs, 6, Z_DEFLATED, 16 + MAX_WBITS, 8,
                         Z_FIXED);
            std::vector<uint8_t> out(
                deflateBound(&zs, (uLong)payload.size()) + 64);
            zs.next_in = (Bytef*)payload.data();
            zs.avail_in = (uInt)payload.size();
            zs.next_out = out.data();
            zs.avail_out = (uInt)out.size();
            deflate(&zs, Z_FINISH);
            out.resize(out.size() - zs.avail_out);
            deflateEnd(&zs);
            comps.push_back(out);
        }
        for (auto& comp : comps) {
            for (size_t cut = 0; cut < comp.size(); cut++) {
                std::vector<uint8_t> part(comp.begin(),
                                          comp.begin() + cut);
                std::vector<uint8_t> got;
                std::string err;
                bool trunc = false;
                int rc = fast_decode(part, &got, 4096, &err, &trunc);
                CHECK(rc == 0, "every-byte truncation");
                if (rc != 0) {
                    std::fprintf(stderr, "  cut=%zu err=%s\n", cut,
                                 err.c_str());
                    break;
                }
                CHECK(got.size() <= payload.size(), "trunc size");
                CHECK(std::memcmp(got.data(), payload.data(),
                                  got.size()) == 0, "trunc prefix");
            }
        }
    }

    // corruption: error or silent end, never a crash / accepted-bad-CRC
    {
        std::vector<uint8_t> payload = make_fastq(1000, &rng);
        std::vector<uint8_t> comp = gzip_compress(payload, 1, false);
        for (int trial = 0; trial < 400; trial++) {
            std::vector<uint8_t> bad = comp;
            size_t at = rng() % bad.size();
            bad[at] ^= (uint8_t)(1 + rng() % 255);
            std::vector<uint8_t> got;
            std::string err;
            bool trunc = false;
            int rc = fast_decode(bad, &got, 4096, &err, &trunc);
            if (rc == 0 && !trunc) {
                // full decode claimed: CRC+ISIZE verified, so the
                // output must be byte-identical to the original
                CHECK(got == payload, "corrupt-accepted");
            }
        }
        // flipping a payload-area bit must not pass the CRC
        std::vector<uint8_t> bad = comp;
        bad[comp.size() / 2] ^= 4;
        std::vector<uint8_t> got;
        std::string err;
        bool trunc = false;
        int rc = fast_decode(bad, &got, 4096, &err, &trunc);
        CHECK(rc != 0 || trunc || got == payload, "crc-catch");
    }

    // crc cross-check: the folded (PCLMUL) path must match slice-by-8
    // bit for bit over random lengths/alignments/seeds
    {
        std::vector<uint8_t> data(1 << 18);
        for (auto& b : data) b = (uint8_t)rng();
        for (int trial = 0; trial < 200; trial++) {
            size_t off = rng() % 4096;
            size_t n = rng() % (data.size() - off);
            uint32_t seed = (uint32_t)rng();
            uint32_t a = kvq_fast::crc32_update(seed, data.data() + off,
                                                n);
            uint32_t b = kvq_fast::crc32_slice8(seed, data.data() + off,
                                                n);
            CHECK(a == b, "crc-clmul-vs-slice8");
            if (a != b) break;
        }
    }

    std::printf("matrix: %s\n", failures ? "FAILED" : "ok");
}

static double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * ts.tv_nsec;
}

static void bench(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", path);
        return;
    }
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> comp((size_t)sz);
    if (std::fread(comp.data(), 1, comp.size(), f) != comp.size()) {
        std::fclose(f);
        return;
    }
    std::fclose(f);

    const size_t CH = 1u << 20;
    const size_t WIN = 1u << 15;
    std::vector<uint8_t> buf(WIN + CH);

    // fast decoder
    double best_fast = 1e30;
    size_t total = 0;
    static Decoder d;
    for (int rep = 0; rep < 3; rep++) {
        double t0 = now_s();
        d.init(comp.data(), comp.size());
        size_t hist = 0, out_total = 0;
        for (;;) {
            long n = kvq_fast::decode_some(&d, buf.data() + WIN, CH,
                                           hist);
            if (n < 0) {
                std::fprintf(stderr, "fast: error %s\n", d.msg);
                return;
            }
            out_total += (size_t)n;
            size_t keep = (size_t)n + hist;
            if (keep > WIN) keep = WIN;
            std::memmove(buf.data() + WIN - keep,
                         buf.data() + WIN + n - keep, keep);
            hist = keep;
            if (d.phase == kvq_fast::PH_DONE
                    || d.phase == kvq_fast::PH_TRUNC) break;
        }
        double dt = now_s() - t0;
        if (dt < best_fast) best_fast = dt;
        total = out_total;
    }

    // zlib streaming (the ring's old loop shape)
    double best_z = 1e30;
    for (int rep = 0; rep < 3; rep++) {
        double t0 = now_s();
        z_stream zs;
        std::memset(&zs, 0, sizeof zs);
        inflateInit2(&zs, 16 + MAX_WBITS);
        zs.next_in = comp.data();
        zs.avail_in = (uInt)comp.size();
        size_t out_total = 0;
        for (;;) {
            zs.next_out = buf.data();
            zs.avail_out = (uInt)buf.size();
            int ret = inflate(&zs, Z_NO_FLUSH);
            out_total += buf.size() - zs.avail_out;
            if (ret == Z_STREAM_END) {
                if (!zs.avail_in) break;
                inflateReset(&zs);
                continue;
            }
            if (ret != Z_OK && ret != Z_BUF_ERROR) {
                std::fprintf(stderr, "zlib: error %s\n",
                             zs.msg ? zs.msg : "?");
                return;
            }
            if (ret == Z_BUF_ERROR && !zs.avail_in) break;
        }
        inflateEnd(&zs);
        double dt = now_s() - t0;
        if (dt < best_z) best_z = dt;
        if (out_total != total)
            std::fprintf(stderr, "SIZE MISMATCH zlib=%zu fast=%zu\n",
                         out_total, total);
    }

    std::printf("bench %s: %.2f MB decompressed\n", path, total / 1e6);
    std::printf("  zlib: %6.1f MB/s\n", total / 1e6 / best_z);
    std::printf("  fast: %6.1f MB/s  (%.2fx)\n", total / 1e6 / best_fast,
                best_z / best_fast);
}

int main(int argc, char** argv) {
    run_matrix();
    if (argc > 1) bench(argv[1]);
    return failures ? 1 : 0;
}
