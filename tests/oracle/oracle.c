/* Test-only golden oracle for speex_resampler_tpu.
 *
 * Builds the reference speexdsp resampler (read from /root/reference at
 * compile time, never vendored here) into a small CLI that dumps filter
 * tables, resampled PCM, and internal state so the JAX/Pallas implementation
 * can be asserted against it sample-by-sample.
 *
 * The reference is compiled exactly like the shipped WASM build
 * (scripts/build_emscripten.sh:18-19): -DFLOATING_POINT -DOUTSIDE_SPEEX,
 * so spx_word16_t = float and no SIMD overrides.
 *
 * The same source also builds the reference's OTHER numeric universe
 * (-DFIXED_POINT -DOUTSIDE_SPEEX, arch.h:39-67): spx_word16_t = int16 and
 * Q15 integer hot loops.  conftest builds both binaries; the few dump-format
 * differences are handled with the same #ifdef the reference itself uses.
 *
 * Including resample.c directly gives access to the internal
 * SpeexResamplerState_ struct (resample.c:116-146) for table/state dumps.
 */
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <time.h>

#define EXPORT
#include "resample.c" /* resolved via -I$REFERENCE/deps/speex */

static void die(const char *msg)
{
    fprintf(stderr, "oracle: %s\n", msg);
    exit(1);
}

/* Dump filter-design internals as a simple text header + binary f32 table.
 * Layout on stdout:
 *   line 1: "num den filt_len oversample use_direct sinc_table_length
 *            int_advance frac_advance cutoff(%.9g) in_latency out_latency"
 *   then sinc_table_length float32 values (raw little-endian).
 */
static int cmd_tables(int argc, char **argv)
{
    if (argc < 5)
        die("tables <channels> <in_rate> <out_rate> <quality>");
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);
    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");
    int use_direct =
        (st->resampler_ptr == resampler_basic_direct_single
#ifndef FIXED_POINT
         || st->resampler_ptr == resampler_basic_direct_double
#endif
        );
    fprintf(stdout, "%u %u %u %u %d %u %d %d %.9g %d %d\n", st->num_rate,
            st->den_rate, st->filt_len, st->oversample, use_direct,
            st->sinc_table_length, st->int_advance, st->frac_advance,
            (double)st->cutoff, speex_resampler_get_input_latency(st),
            speex_resampler_get_output_latency(st));
    fflush(stdout);
    /* float build: raw f32 entries; fixed build: raw int16 entries */
    fwrite(st->sinc_table, sizeof(spx_word16_t), st->sinc_table_length,
           stdout);
    speex_resampler_destroy(st);
    return 0;
}

/* Replicates the JS wrapper's processChunk loop (src/index.ts:50-116):
 * for each chunk of chunk_frames frames read from in.pcm, output capacity is
 * floor(ceil(chunk_bytes*out_rate/in_rate) / channels / 2) frames; leftover
 * unconsumed input within a chunk is dropped, exactly like the JS layer.
 * Writes resampled s16 interleaved PCM to out file.
 *
 *   process <channels> <in_rate> <out_rate> <quality> <chunk_frames>
 *           <in.pcm> <out.pcm> [skip_zeros]
 * chunk_frames == 0 means "whole file in one chunk".
 */
static int cmd_process(int argc, char **argv)
{
    if (argc < 8)
        die("process <ch> <in> <out> <q> <chunk_frames> <in.pcm> <out.pcm> [skip_zeros]");
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);
    long chunk_frames = atol(argv[5]);
    const char *in_path = argv[6];
    const char *out_path = argv[7];
    int skip_zeros = (argc > 8) ? atoi(argv[8]) : 0;

    FILE *fin = fopen(in_path, "rb");
    if (!fin)
        die("cannot open input");
    fseek(fin, 0, SEEK_END);
    long nbytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    int16_t *pcm = (int16_t *)malloc(nbytes);
    if (fread(pcm, 1, nbytes, fin) != (size_t)nbytes)
        die("short read");
    fclose(fin);

    long total_frames = nbytes / 2 / channels;
    if (chunk_frames <= 0)
        chunk_frames = total_frames;

    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");
    if (skip_zeros)
        speex_resampler_skip_zeros(st);

    FILE *fout = fopen(out_path, "wb");
    if (!fout)
        die("cannot open output");

    long out_buffer_size = 0; /* JS _outBufferSize: grows, never shrinks */
    for (long pos = 0; pos < total_frames; pos += chunk_frames) {
        long frames = total_frames - pos;
        if (frames > chunk_frames)
            frames = chunk_frames;
        long chunk_bytes = frames * channels * 2;
        /* JS: Math.ceil(chunk.length * outRate / inRate) bytes grows the
         * RETAINED buffer (src/index.ts:80-87); then
         * setValue(outLenPtr, this._outBufferSize / channels / 2) — float
         * div truncated by the i32 store (src/index.ts:95). */
        long out_buf_bytes =
            (chunk_bytes * (long)out_rate + in_rate - 1) / in_rate;
        if (out_buf_bytes > out_buffer_size)
            out_buffer_size = out_buf_bytes;
        spx_uint32_t in_len = (spx_uint32_t)frames;
        spx_uint32_t out_len = (spx_uint32_t)(out_buffer_size / channels / 2);
        int16_t *outbuf = (int16_t *)calloc((size_t)out_len * channels, 2);
        int perr = speex_resampler_process_interleaved_int(
            st, pcm + pos * channels, &in_len, outbuf, &out_len);
        if (perr != 0)
            die("process failed");
        fwrite(outbuf, 2, (size_t)out_len * channels, fout);
        free(outbuf);
    }
    fclose(fout);
    speex_resampler_destroy(st);
    free(pcm);
    return 0;
}

/* Like cmd_process but with an ARBITRARY chunk schedule, for asserting the
 * JS wrapper's retained-output-buffer capacity semantics
 * (src/index.ts:80-95) under varying chunk sizes:
 *   chunks <channels> <in_rate> <out_rate> <quality> <in.pcm> <out.pcm>
 *          <schedule.txt> [skip_at_chunk]
 * schedule.txt holds whitespace-separated frame counts; the schedule is
 * repeated cyclically until the input is consumed.  skip_at_chunk >= 0
 * calls speex_resampler_skip_zeros before that chunk index (the C API
 * allows it at any time, resample.c:1200-1206).
 */
static int cmd_chunks(int argc, char **argv)
{
    if (argc < 8)
        die("chunks <ch> <in> <out> <q> <in.pcm> <out.pcm> <schedule.txt> [skip_at]");
    long skip_at = (argc > 8) ? atol(argv[8]) : -1;
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);

    FILE *fin = fopen(argv[5], "rb");
    if (!fin)
        die("cannot open input");
    fseek(fin, 0, SEEK_END);
    long nbytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    int16_t *pcm = (int16_t *)malloc(nbytes);
    if (fread(pcm, 1, nbytes, fin) != (size_t)nbytes)
        die("short read");
    fclose(fin);

    long n_sched = 0, cap_sched = 16;
    long *sched = (long *)malloc(cap_sched * sizeof(long));
    FILE *fs = fopen(argv[7], "r");
    if (!fs)
        die("cannot open schedule");
    long v;
    while (fscanf(fs, "%ld", &v) == 1) {
        if (n_sched == cap_sched)
            sched = (long *)realloc(sched, (cap_sched *= 2) * sizeof(long));
        sched[n_sched++] = v;
    }
    fclose(fs);
    if (!n_sched)
        die("empty schedule");

    long total_frames = nbytes / 2 / channels;
    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");
    FILE *fout = fopen(argv[6], "wb");
    if (!fout)
        die("cannot open output");

    long out_buffer_size = 0;
    long si = 0;
    for (long pos = 0; pos < total_frames;) {
        if (si == skip_at)
            speex_resampler_skip_zeros(st);
        long frames = sched[si++ % n_sched];
        if (frames > total_frames - pos)
            frames = total_frames - pos;
        long chunk_bytes = frames * channels * 2;
        long out_buf_bytes =
            (chunk_bytes * (long)out_rate + in_rate - 1) / in_rate;
        if (out_buf_bytes > out_buffer_size)
            out_buffer_size = out_buf_bytes;
        spx_uint32_t in_len = (spx_uint32_t)frames;
        spx_uint32_t out_len = (spx_uint32_t)(out_buffer_size / channels / 2);
        int16_t *outbuf = (int16_t *)calloc((size_t)out_len * channels, 2);
        if (speex_resampler_process_interleaved_int(
                st, pcm + pos * channels, &in_len, outbuf, &out_len))
            die("process failed");
        fwrite(outbuf, 2, (size_t)out_len * channels, fout);
        free(outbuf);
        /* accounting trace for differential debugging (stderr only) */
        fprintf(stderr, "chunk %ld offered %ld consumed %u produced %u cap %ld\n",
                si - 1, frames, in_len, out_len,
                (long)(out_buffer_size / channels / 2));
        pos += frames; /* JS drops unconsumed input (ignores in_len) */
    }
    fclose(fout);
    speex_resampler_destroy(st);
    free(pcm);
    free(sched);
    return 0;
}

/* Mid-stream reconfiguration scenario for magic-sample coverage:
 *   setrate <ch> <in0> <out0> <q0> <chunk_frames> <in.pcm> <out.pcm>
 *           <switch_chunk> <in1> <out1> <q1>
 * Processes chunks like cmd_process; before chunk index switch_chunk it
 * calls set_rate(in1,out1) and set_quality(q1) (exercising
 * resample.c:1107-1145 and :1153-1163 incl. update_filter mem migration).
 */
static int cmd_setrate(int argc, char **argv)
{
    if (argc < 12)
        die("setrate <ch> <in0> <out0> <q0> <chunk_frames> <in.pcm> <out.pcm> <switch_chunk> <in1> <out1> <q1>");
    int channels = atoi(argv[1]);
    int in0 = atoi(argv[2]);
    int out0 = atoi(argv[3]);
    int q0 = atoi(argv[4]);
    long chunk_frames = atol(argv[5]);
    const char *in_path = argv[6];
    const char *out_path = argv[7];
    long switch_chunk = atol(argv[8]);
    int in1 = atoi(argv[9]);
    int out1 = atoi(argv[10]);
    int q1 = atoi(argv[11]);

    FILE *fin = fopen(in_path, "rb");
    if (!fin)
        die("cannot open input");
    fseek(fin, 0, SEEK_END);
    long nbytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    int16_t *pcm = (int16_t *)malloc(nbytes);
    if (fread(pcm, 1, nbytes, fin) != (size_t)nbytes)
        die("short read");
    fclose(fin);

    long total_frames = nbytes / 2 / channels;
    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in0, out0, q0, &err);
    if (!st)
        die("init failed");
    FILE *fout = fopen(out_path, "wb");
    if (!fout)
        die("cannot open output");

    int cur_in = in0, cur_out = out0;
    long chunk_idx = 0;
    for (long pos = 0; pos < total_frames; pos += chunk_frames, chunk_idx++) {
        if (chunk_idx == switch_chunk) {
            if (speex_resampler_set_rate(st, in1, out1) != 0)
                die("set_rate failed");
            if (speex_resampler_set_quality(st, q1) != 0)
                die("set_quality failed");
            cur_in = in1;
            cur_out = out1;
        }
        long frames = total_frames - pos;
        if (frames > chunk_frames)
            frames = chunk_frames;
        long chunk_bytes = frames * channels * 2;
        long out_buf_bytes =
            (chunk_bytes * (long)cur_out + cur_in - 1) / cur_in;
        spx_uint32_t in_len = (spx_uint32_t)frames;
        spx_uint32_t out_len = (spx_uint32_t)(out_buf_bytes / channels / 2);
        /* +64 slack: after a rate switch magic samples may produce extra
         * output; the JS wrapper never switches rates so there is no wrapper
         * behavior to match — give the core room and record what it emits. */
        out_len += 64;
        int16_t *outbuf = (int16_t *)calloc((size_t)out_len * channels, 2);
        int perr = speex_resampler_process_interleaved_int(
            st, pcm + pos * channels, &in_len, outbuf, &out_len);
        if (perr != 0)
            die("process failed");
        uint32_t n = out_len;
        fwrite(&n, 4, 1, fout); /* record per-chunk output count */
        fwrite(outbuf, 2, (size_t)out_len * channels, fout);
        free(outbuf);
    }
    fclose(fout);
    speex_resampler_destroy(st);
    free(pcm);
    return 0;
}

/* Float-sample path golden (speex_resampler_process_interleaved_float,
 * resample.c:1037-1059): raw f32 interleaved samples in/out (±32768 scale).
 *   processf <channels> <in_rate> <out_rate> <quality> <chunk_frames>
 *            <in.f32> <out.f32>
 * chunk_frames == 0 means one shot.  Output capacity per chunk is
 * ceil(frames*out_rate/in_rate) frames (no JS wrapper exists for this path;
 * the capacity is ample so nothing is dropped).
 */
/* Capacity-bound accounting differential:
 *   caps <ch> <in> <out> <q> <float01> <in.pcm> <out.bin> <sched.txt>
 *        [switch_chunk in1 out1 q1]
 * sched.txt holds whitespace-separated PAIRS "frames cap" (cycled): each
 * process call offers `frames` input frames with an output capacity of
 * exactly `cap` frames — so the caller can force the capacity to bind at
 * and around the core's internal bite/slot boundaries
 * (resample.c:929-963 native entry, :971-1035 ystack entry; float01
 * selects which via the #ifdef FIXED_POINT name swap).  With
 * switch_chunk >= 0, set_rate(in1,out1)+set_quality(q1) run before that
 * chunk so the magic-sample drain also interacts with tight caps.
 * Per chunk the output stream carries: uint32 consumed, uint32 produced,
 * then produced*ch samples (int16, or float32 when float01).  Unconsumed
 * input is dropped JS-style (src/index.ts:92-116). */
static int cmd_caps(int argc, char **argv)
{
    if (argc < 9)
        die("caps <ch> <in> <out> <q> <float01> <in.pcm> <out.bin> <sched.txt> [switch_chunk in1 out1 q1]");
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);
    int use_float = atoi(argv[5]);
    long switch_chunk = (argc > 9) ? atol(argv[9]) : -1;

    FILE *fin = fopen(argv[6], "rb");
    if (!fin)
        die("cannot open input");
    fseek(fin, 0, SEEK_END);
    long nbytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    int16_t *pcm = (int16_t *)malloc(nbytes);
    if (fread(pcm, 1, nbytes, fin) != (size_t)nbytes)
        die("short read");
    fclose(fin);

    long n_sched = 0, cap_sched = 16;
    long *sched = (long *)malloc(cap_sched * 2 * sizeof(long));
    FILE *fs = fopen(argv[8], "r");
    if (!fs)
        die("cannot open schedule");
    long a, b;
    while (fscanf(fs, "%ld %ld", &a, &b) == 2) {
        if (n_sched == cap_sched)
            sched = (long *)realloc(sched,
                                    (cap_sched *= 2) * 2 * sizeof(long));
        sched[2 * n_sched] = a;
        sched[2 * n_sched + 1] = b;
        n_sched++;
    }
    fclose(fs);
    if (!n_sched)
        die("empty schedule");

    long total_frames = nbytes / 2 / channels;
    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");
    FILE *fout = fopen(argv[7], "wb");
    if (!fout)
        die("cannot open output");

    float *fbuf = NULL;
    if (use_float) {
        fbuf = (float *)malloc((size_t)total_frames * channels * 4);
        for (long i = 0; i < total_frames * channels; i++)
            fbuf[i] = (float)pcm[i];
    }

    long si = 0;
    for (long pos = 0; pos < total_frames;) {
        if (si == switch_chunk) {
            if (speex_resampler_set_rate(st, (spx_uint32_t)atol(argv[10]),
                                         (spx_uint32_t)atol(argv[11])))
                die("set_rate failed");
            if (speex_resampler_set_quality(st, atoi(argv[12])))
                die("set_quality failed");
        }
        long frames = sched[2 * (si % n_sched)];
        long cap = sched[2 * (si % n_sched) + 1];
        si++;
        if (frames > total_frames - pos)
            frames = total_frames - pos;
        spx_uint32_t in_len = (spx_uint32_t)frames;
        spx_uint32_t out_len = (spx_uint32_t)cap;
        if (use_float) {
            float *outbuf = (float *)calloc((size_t)cap * channels, 4);
            if (speex_resampler_process_interleaved_float(
                    st, fbuf + pos * channels, &in_len, outbuf, &out_len))
                die("process failed");
            fwrite(&in_len, 4, 1, fout);
            fwrite(&out_len, 4, 1, fout);
            fwrite(outbuf, 4, (size_t)out_len * channels, fout);
            free(outbuf);
        } else {
            int16_t *outbuf = (int16_t *)calloc((size_t)cap * channels, 2);
            if (speex_resampler_process_interleaved_int(
                    st, pcm + pos * channels, &in_len, outbuf, &out_len))
                die("process failed");
            fwrite(&in_len, 4, 1, fout);
            fwrite(&out_len, 4, 1, fout);
            fwrite(outbuf, 2, (size_t)out_len * channels, fout);
            free(outbuf);
        }
        pos += frames; /* JS drops unconsumed input */
    }
    fclose(fout);
    speex_resampler_destroy(st);
    free(pcm);
    free(fbuf);
    free(sched);
    return 0;
}

static int cmd_processf(int argc, char **argv)
{
    if (argc < 8)
        die("processf <ch> <in> <out> <q> <chunk_frames> <in.f32> <out.f32>");
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);
    long chunk_frames = atol(argv[5]);

    FILE *fin = fopen(argv[6], "rb");
    if (!fin)
        die("cannot open input");
    fseek(fin, 0, SEEK_END);
    long nbytes = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    float *pcm = (float *)malloc(nbytes);
    if (fread(pcm, 1, nbytes, fin) != (size_t)nbytes)
        die("short read");
    fclose(fin);

    long total_frames = nbytes / 4 / channels;
    if (chunk_frames <= 0)
        chunk_frames = total_frames;

    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");
    FILE *fout = fopen(argv[7], "wb");
    if (!fout)
        die("cannot open output");

    for (long pos = 0; pos < total_frames; pos += chunk_frames) {
        long frames = total_frames - pos;
        if (frames > chunk_frames)
            frames = chunk_frames;
        spx_uint32_t in_len = (spx_uint32_t)frames;
        spx_uint32_t out_len = (spx_uint32_t)(
            (frames * (long)out_rate + in_rate - 1) / in_rate + 1);
        float *outbuf = (float *)calloc((size_t)out_len * channels, 4);
        int perr = speex_resampler_process_interleaved_float(
            st, pcm + pos * channels, &in_len, outbuf, &out_len);
        if (perr != 0)
            die("process failed");
        fwrite(outbuf, 4, (size_t)out_len * channels, fout);
        free(outbuf);
    }
    fclose(fout);
    speex_resampler_destroy(st);
    free(pcm);
    return 0;
}

/* CPU baseline throughput (SURVEY.md §6: the reference publishes no
 * numbers; the compiled oracle IS the reference CPU baseline).
 *   bench <channels> <in_rate> <out_rate> <quality> [min_seconds]
 * Streams synthetic random PCM through process_interleaved_int in
 * 1024-frame chunks (the core re-chunks to <=160 inputs internally,
 * resample.c:988) until min_seconds (default 2.0) of wall-clock elapses
 * after a short warmup; prints one JSON line with in/out samples/sec.
 */
static int cmd_bench(int argc, char **argv)
{
    if (argc < 5)
        die("bench <channels> <in_rate> <out_rate> <quality> [min_seconds]");
    int channels = atoi(argv[1]);
    int in_rate = atoi(argv[2]);
    int out_rate = atoi(argv[3]);
    int quality = atoi(argv[4]);
    double min_seconds = (argc > 5) ? atof(argv[5]) : 2.0;

    const long chunk_frames = 1024;
    long n = chunk_frames * channels;
    int16_t *pcm = (int16_t *)malloc(n * 2);
    unsigned s = 12345;
    for (long i = 0; i < n; i++) {
        s = s * 1664525u + 1013904223u;
        pcm[i] = (int16_t)((s >> 16) / 2); /* music-scale, clear of clamp */
    }
    long out_cap = (chunk_frames * (long)out_rate + in_rate - 1) / in_rate
                   + 64;
    int16_t *outbuf = (int16_t *)malloc(out_cap * channels * 2);

    int err = 0;
    SpeexResamplerState *st =
        speex_resampler_init(channels, in_rate, out_rate, quality, &err);
    if (!st)
        die("init failed");

    struct timespec t0, t1;
    long in_frames = 0, out_frames = 0;
    volatile int16_t sink = 0;
    /* warmup pass (touch caches, settle the filter) */
    for (int i = 0; i < 64; i++) {
        spx_uint32_t in_len = (spx_uint32_t)chunk_frames;
        spx_uint32_t out_len = (spx_uint32_t)out_cap;
        speex_resampler_process_interleaved_int(st, pcm, &in_len, outbuf,
                                                &out_len);
        sink ^= outbuf[0];
    }
    clock_gettime(CLOCK_MONOTONIC, &t0);
    double elapsed = 0.0;
    while (elapsed < min_seconds) {
        for (int i = 0; i < 256; i++) {
            spx_uint32_t in_len = (spx_uint32_t)chunk_frames;
            spx_uint32_t out_len = (spx_uint32_t)out_cap;
            if (speex_resampler_process_interleaved_int(st, pcm, &in_len,
                                                        outbuf, &out_len))
                die("process failed");
            sink ^= outbuf[0];
            in_frames += in_len;
            out_frames += out_len;
        }
        clock_gettime(CLOCK_MONOTONIC, &t1);
        elapsed = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    }
    speex_resampler_destroy(st);
    printf("{\"in_samples_per_sec\": %.0f, \"out_samples_per_sec\": %.0f, "
           "\"elapsed_s\": %.3f, \"channels\": %d, \"sink\": %d}\n",
           in_frames * channels / elapsed, out_frames * channels / elapsed,
           elapsed, channels, (int)sink);
    free(pcm);
    free(outbuf);
    return 0;
}

int main(int argc, char **argv)
{
    if (argc < 2)
        die("usage: oracle <tables|process|processf|setrate|bench> ...");
    if (!strcmp(argv[1], "tables"))
        return cmd_tables(argc - 1, argv + 1);
    if (!strcmp(argv[1], "process"))
        return cmd_process(argc - 1, argv + 1);
    if (!strcmp(argv[1], "processf"))
        return cmd_processf(argc - 1, argv + 1);
    if (!strcmp(argv[1], "setrate"))
        return cmd_setrate(argc - 1, argv + 1);
    if (!strcmp(argv[1], "bench"))
        return cmd_bench(argc - 1, argv + 1);
    if (!strcmp(argv[1], "chunks"))
        return cmd_chunks(argc - 1, argv + 1);
    if (!strcmp(argv[1], "caps"))
        return cmd_caps(argc - 1, argv + 1);
    die("unknown command");
    return 1;
}
