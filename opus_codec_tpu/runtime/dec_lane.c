/* Native CELT decode-side dry parse — the host lane of the batched
 * decoder, OpenMP over streams.
 *
 * Port of celt/dec_parse.py (itself mirroring celt_decoder.c:970-1365,
 * bands.c:943-1231 decode direction, rate.c:248-645, entdec.c,
 * laplace.c) for mono frames.  The Python parser is the tested ground
 * truth; this lane must reproduce every output array bit-for-bit —
 * tests/test_native_dec_parse.py holds the cross-check.
 *
 * Mode tables (eband layout, allocation matrix, pulse cache, caps,
 * coarse-energy probability model) are passed in from Python so the
 * tables live in exactly one place (celt/modes.py).
 *
 * Build: compiled on demand by opus_codec_tpu/runtime/__init__.py.
 */
#include <string.h>

typedef unsigned int u32;
typedef unsigned long long u64;
typedef unsigned char u8;

#define BITRES 3
#define ALLOC_STEPS 6
#define FINE_OFFSET 21
#define MAX_FINE_BITS 8
#define LOG_MAX_PSEUDO 6
#define NODE_NONE (-1)
#define NODE_ZERO 0
#define NODE_PVQ 1
#define NODE_SPLIT 2

static const int TF_SELECT_TABLE[4][8] = {
    {0, -1, 0, -1, 0, -1, 0, -1},
    {0, -1, 0, -2, 1, 0, 1, -1},
    {0, -2, 0, -3, 2, 0, 1, -1},
    {0, -2, 0, -3, 3, 0, 1, -1}};
static const u8 SMALL_ENERGY_ICDF[3] = {2, 1, 0};
static const u8 SPREAD_ICDF[4] = {25, 23, 2, 0};
static const u8 TAPSET_ICDF[3] = {2, 1, 0};
static const u8 TRIM_ICDF[11] = {126, 124, 119, 109, 87, 41, 19, 9,
                                 4, 2, 0};
static const int BIT_INTERLEAVE[16] = {0, 1, 1, 1, 2, 3, 3, 3,
                                       2, 3, 3, 3, 2, 3, 3, 3};
static const int BIT_DEINTERLEAVE[16] = {
    0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
    0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF};
static const u32 TELL_CORR[8] = {35733, 38967, 42495, 46340,
                                 50535, 55109, 60097, 65535};
static const int EXP2_TABLE8[8] = {16384, 17866, 19483, 21247,
                                   23170, 25267, 27554, 30048};

static int ec_ilog(u32 v) { return v ? 32 - __builtin_clz(v) : 0; }

/* ---- range decoder (entdec.c semantics) ------------------------- */
typedef struct {
    const u8 *buf;
    int storage, offs, end_offs;
    u32 end_window;
    int nend_bits, nbits_total;
    u32 rng, val, ext;
    int rem, error;
} Dec;

static int rd_byte(Dec *d)
{
    return d->offs < d->storage ? d->buf[d->offs++] : 0;
}

static int rd_byte_end(Dec *d)
{
    return d->end_offs < d->storage
        ? d->buf[d->storage - ++d->end_offs] : 0;
}

static void dnorm(Dec *d)
{
    while (d->rng <= (1u << 23)) {
        int sym;
        d->nbits_total += 8;
        d->rng <<= 8;
        sym = d->rem;
        d->rem = rd_byte(d);
        sym = ((sym << 8) | d->rem) >> 1;   /* SYM_BITS-CODE_EXTRA=1 */
        d->val = ((d->val << 8) + (255 & ~sym)) & 0x7FFFFFFFu;
    }
}

static void dinit(Dec *d, const u8 *buf, int len)
{
    memset(d, 0, sizeof(*d));
    d->buf = buf;
    d->storage = len;
    d->nbits_total = 33 - 24;          /* CODE_BITS+1 - 3*SYM_BITS */
    d->rng = 1u << 7;                  /* CODE_EXTRA = 7 */
    d->rem = rd_byte(d);
    d->val = d->rng - 1 - (u32)(d->rem >> 1);
    dnorm(d);
}

static int dtell(const Dec *d) { return d->nbits_total - ec_ilog(d->rng); }

static int dtell_frac(const Dec *d)
{
    int nbits = d->nbits_total << BITRES;
    int l = ec_ilog(d->rng);
    u32 r = d->rng >> (l - 16);
    int b = (int)(r >> 12) - 8;
    b += r > TELL_CORR[b] ? 1 : 0;
    return nbits - ((l << 3) + b);
}

static u32 ddecode(Dec *d, u32 ft)
{
    u32 s;
    d->ext = d->rng / ft;
    s = d->val / d->ext;
    return ft - (s + 1 < ft ? s + 1 : ft);
}

static u32 ddecode_bin(Dec *d, int bits)
{
    u32 s;
    d->ext = d->rng >> bits;
    s = d->val / d->ext;
    return (1u << bits) - (s + 1 < (1u << bits) ? s + 1 : (1u << bits));
}

static void dupdate(Dec *d, u32 fl, u32 fh, u32 ft)
{
    u32 s = d->ext * (ft - fh);
    d->val -= s;
    d->rng = fl > 0 ? d->ext * (fh - fl) : d->rng - s;
    dnorm(d);
}

static int dbit_logp(Dec *d, int logp)
{
    u32 r = d->rng, v = d->val, s = r >> logp;
    int ret = v < s;
    if (!ret)
        d->val = v - s;
    d->rng = ret ? s : r - s;
    dnorm(d);
    return ret;
}

static int dicdf(Dec *d, const u8 *icdf, int ftb)
{
    u32 s = d->rng, v = d->val, r = s >> ftb, t;
    int ret = -1;
    do {
        t = s;
        ret++;
        s = r * icdf[ret];
    } while (v < s);
    d->val = v - s;
    d->rng = t - s;
    dnorm(d);
    return ret;
}

static u32 dbits(Dec *d, int bits)
{
    u32 window = d->end_window;
    int available = d->nend_bits;
    u32 ret;
    if (available < bits) {
        while (available <= 32 - 8) {
            window |= (u32)rd_byte_end(d) << available;
            available += 8;
        }
    }
    ret = window & ((1u << bits) - 1);
    window >>= bits;
    available -= bits;
    d->end_window = window;
    d->nend_bits = available;
    d->nbits_total += bits;
    return ret;
}

static u32 duint(Dec *d, u64 ft64)
{
    int ftb;
    u32 ft = (u32)(ft64 - 1);   /* ft-1 always fits u32 */
    ftb = ec_ilog(ft);
    if (ftb > 8) {
        u32 s, t;
        ftb -= 8;
        s = ddecode(d, (ft >> ftb) + 1);
        dupdate(d, s, s + 1, (ft >> ftb) + 1);
        t = (s << ftb) | dbits(d, ftb);
        if (t <= ft)
            return t;
        d->error = 1;
        return ft;
    } else {
        u32 s;
        ft++;
        s = ddecode(d, ft);
        dupdate(d, s, s + 1, ft);
        return s;
    }
}

/* ---- laplace decode (laplace.c) --------------------------------- */
static int laplace_dec(Dec *d, int fs, int decay)
{
    int val = 0, fl = 0;
    int fm = (int)ddecode_bin(d, 15);
    if (fm >= fs) {
        val++;
        fl = fs;
        fs = (((32768 - 2 * 16 - fs) * (16384 - decay)) >> 15) + 1;
        while (fs > 1 && fm >= fl + 2 * fs) {
            fs *= 2;
            fl += fs;
            fs = ((fs - 2) * decay) >> 15;
            fs += 1;
            val++;
        }
        if (fs <= 1) {
            int di = (fm - fl) >> 1;
            val += di;
            fl += 2 * di;
        }
        if (fm < fl + fs)
            val = -val;
        else
            fl += fs;
    }
    dupdate(d, fl, fl + fs < 32768 ? fl + fs : 32768, 32768);
    return val;
}

/* ---- CWRS (cwrs.c U/V/cwrsi via the row recurrence) ------------- */
static u64 Ufn(int n, int k)
{
    u64 a, b;
    int kk;
    if (n < k) { int t = n; n = k; k = t; }
    if (k == 0) return n == 0;
    if (n == 0) return 0;
    if (n == 1 || k == 1) return 1;
    a = 1; b = 0;                  /* U(n,1), U(n,0) */
    for (kk = 2; kk <= k; kk++) {
        u64 c = ((u64)(2 * n - 1) * a - b) / (u64)(kk - 1) + b;
        b = a;
        a = c;
    }
    return a;
}

static u64 Vfn(int n, int k) { return Ufn(n, k) + Ufn(n, k + 1); }

static void cwrsi(int n, int k, u64 i, int *y)
{
    int ncur = n, j;
    for (j = 0; j < n; j++) {
        u64 p = Ufn(ncur, k + 1);
        int s = i >= p, k0, val;
        if (s)
            i -= p;
        k0 = k;
        p = Ufn(ncur, k);
        while (p > i) {
            k--;
            p = Ufn(ncur, k);
        }
        i -= p;
        val = k0 - k;
        y[j] = s ? -val : val;
        ncur--;
    }
}

/* ---- misc bit-exact helpers ------------------------------------- */
static u32 lcg(u32 seed) { return 1664525u * seed + 1013904223u; }

static int frac_mul16(int a, int b) { return (16384 + a * b) >> 15; }

static int bexact_cos(int x)
{
    int tmp = (4096 + x * x) >> 13, x2 = tmp;
    x2 = (32767 - x2) + frac_mul16(
        x2, -7651 + frac_mul16(x2, 8277 + frac_mul16(-626, x2)));
    return 1 + x2;
}

static int bexact_log2tan(int isin, int icos)
{
    int lc = ec_ilog((u32)icos), ls = ec_ilog((u32)isin);
    icos <<= 15 - lc;
    isin <<= 15 - ls;
    return (ls - lc) * (1 << 11)
        + frac_mul16(isin, frac_mul16(isin, -2597) + 7932)
        - frac_mul16(icos, frac_mul16(icos, -2597) + 7932);
}

static u32 iisqrt(u32 x)
{
    u32 r = 0, b = 1u << 15;
    while (b) {
        u32 t = r + b;
        if ((u64)t * t <= x)
            r = t;
        b >>= 1;
    }
    return r;
}

static int compute_qn(int N, int b, int offset, int pulse_cap)
{
    int N2 = 2 * N - 1, qb, qn;
    int num = b + N2 * offset;
    qb = num >= 0 ? num / N2 : -((-num) / N2);
    if (qb > b - pulse_cap - (4 << BITRES))
        qb = b - pulse_cap - (4 << BITRES);
    if (qb > 8 << BITRES)
        qb = 8 << BITRES;
    if (qb < ((1 << BITRES) >> 1))
        return 1;
    qn = EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES));
    qn = ((qn + 1) >> 1) << 1;
    return qn;
}

/* ---- shared per-stream context ---------------------------------- */
typedef struct {
    int lm, nb, n_nodes, n_alloc;
    const int *e_bands;
    const u8 *alloc_vectors;
    const int *log_n;
    const int *cache_index;      /* [(lm+2)*nb] */
    const u8 *cache_bits;
    const int *caps;             /* [nb], this lm, C=1 */
    const u8 *e_prob;            /* [2][42] inter,intra for this lm */
    const int *band_first;       /* [nb] */
    const int *node_child;       /* [n_nodes*2] */
} Mode;

typedef struct {
    /* outputs for one stream */
    int *scal;                   /* [16] scalars, see python wrapper */
    int *qi, *tf_res, *fine_q, *fine_bits, *pulses, *sign_n1;
    int *finalise;               /* [2*nb] */
    int *band_B, *band_recomb, *band_tdiv, *band_eff;
    int *cmasks;
    int *node_kind, *node_k, *node_itheta, *node_fill;
    u32 *node_index, *node_seed;
} Out;

typedef struct {
    const Mode *m;
    Dec *dec;
    Out *o;
    int remaining_bits;
    int band;
    u32 seed;
} Walk;

static int bits2pulses(const Mode *m, int band, int LM, int bits)
{
    int off = m->cache_index[(LM + 1) * m->nb + band];
    const u8 *cache = m->cache_bits + off;
    int lo = 0, hi = cache[0], i, mid;
    bits--;
    for (i = 0; i < LOG_MAX_PSEUDO; i++) {
        mid = (lo + hi + 1) >> 1;
        if ((int)cache[mid] >= bits)
            hi = mid;
        else
            lo = mid;
    }
    if (bits - (lo == 0 ? -1 : (int)cache[lo]) <= (int)cache[hi] - bits)
        return lo;
    return hi;
}

static int pulses2bits(const Mode *m, int band, int LM, int pulses)
{
    int off = m->cache_index[(LM + 1) * m->nb + band];
    return pulses == 0 ? 0 : (int)m->cache_bits[off + pulses] + 1;
}

static int get_pulses(int i)
{
    return i < 8 ? i : (8 + (i & 7)) << ((i >> 3) - 1);
}

/* _theta_mono (bands.c:700-903 decode, B0==1 entry handled too) */
static void theta_mono(Walk *w, int N, int b, int B, int B0, int LM,
                       int *itheta_out, int *qalloc, int *delta_out)
{
    const Mode *m = w->m;
    Dec *d = w->dec;
    int i = w->band;
    int pulse_cap = m->log_n[i] + LM * (1 << BITRES);
    int offset = (pulse_cap >> 1) - 4;
    int qn = compute_qn(N, b, offset, pulse_cap);
    int tell = dtell_frac(d);
    int itheta = 0, delta;
    if (qn != 1) {
        if (B0 > 1) {
            itheta = (int)duint(d, (u32)qn + 1);
        } else {
            int half = qn >> 1;
            u32 ft = (u32)(half + 1) * (u32)(half + 1);
            int fm = (int)ddecode(d, ft);
            u32 fl, fs;
            if (fm < (half * (half + 1) >> 1)) {
                itheta = ((int)iisqrt(8u * (u32)fm + 1) - 1) >> 1;
                fs = itheta + 1;
                fl = (u32)(itheta * (itheta + 1) >> 1);
            } else {
                itheta = (2 * (qn + 1)
                          - (int)iisqrt(8u * (u32)((int)ft - fm - 1) + 1))
                    >> 1;
                fs = qn + 1 - itheta;
                fl = ft - (u32)((qn + 1 - itheta) * (qn + 2 - itheta)
                                >> 1);
            }
            dupdate(d, fl, fl + fs, ft);
        }
        itheta = (itheta * 16384) / qn;
    }
    *qalloc = dtell_frac(d) - tell;
    if (itheta == 0)
        delta = -16384;
    else if (itheta == 16384)
        delta = 16384;
    else {
        int imid = bexact_cos(itheta);
        int iside = bexact_cos(16384 - itheta);
        delta = frac_mul16((N - 1) << 7, bexact_log2tan(iside, imid));
    }
    *itheta_out = itheta;
    *delta_out = delta;
}

/* bands.c:943-1105 decode partition, mono */
static int partition(Walk *w, int node, int N, int b, int B, int LM,
                     int fill)
{
    const Mode *m = w->m;
    Dec *d = w->dec;
    Out *o = w->o;
    int i = w->band;
    int B0 = B;
    int cache_off = m->cache_index[(LM + 1) * m->nb + i];
    const u8 *cache = m->cache_bits;
    int q, curr_bits;
    if (LM != -1
        && b > (int)cache[cache_off + cache[cache_off]] + 12
        && N > 2) {
        int itheta, qalloc, delta, mbits, sbits, cm, rebalance;
        int c0, c1;
        N >>= 1;
        LM -= 1;
        if (B == 1)
            fill = (fill & 1) | (fill << 1);
        B = (B + 1) >> 1;
        theta_mono(w, N, b, B, B0, LM, &itheta, &qalloc, &delta);
        o->node_kind[node] = NODE_SPLIT;
        o->node_itheta[node] = itheta;
        b -= qalloc;
        w->remaining_bits -= qalloc;
        if (itheta == 0) {
            fill &= (1 << B) - 1;
            delta = -16384;
        } else if (itheta == 16384) {
            fill &= ((1 << B) - 1) << B;
            delta = 16384;
        }
        if (B0 > 1 && (itheta & 0x3fff)) {
            if (itheta > 8192)
                delta -= delta >> (4 - LM);
            else {
                int t = delta + ((N << BITRES) >> (5 - LM));
                delta = t < 0 ? t : 0;
            }
        }
        mbits = (b - delta) / 2;
        if (mbits > b)
            mbits = b;
        if (mbits < 0)
            mbits = 0;
        sbits = b - mbits;
        c0 = m->node_child[2 * node];
        c1 = m->node_child[2 * node + 1];
        rebalance = w->remaining_bits;
        if (mbits >= sbits) {
            cm = partition(w, c0, N, mbits, B, LM, fill);
            rebalance = mbits - (rebalance - w->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 0)
                sbits += rebalance - (3 << BITRES);
            cm |= partition(w, c1, N, sbits, B, LM, fill >> B)
                << (B0 >> 1);
        } else {
            cm = partition(w, c1, N, sbits, B, LM, fill >> B)
                << (B0 >> 1);
            rebalance = sbits - (rebalance - w->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 16384)
                mbits += rebalance - (3 << BITRES);
            cm |= partition(w, c0, N, mbits, B, LM, fill);
        }
        return cm;
    }

    /* leaf */
    q = bits2pulses(m, i, LM, b);
    curr_bits = pulses2bits(m, i, LM, q);
    w->remaining_bits -= curr_bits;
    while (w->remaining_bits < 0 && q > 0) {
        w->remaining_bits += curr_bits;
        q--;
        curr_bits = pulses2bits(m, i, LM, q);
        w->remaining_bits -= curr_bits;
    }
    if (q != 0) {
        int K = get_pulses(q);
        u64 total = Vfn(N, K);
        u32 idx = duint(d, total);
        o->node_kind[node] = NODE_PVQ;
        o->node_k[node] = K;
        o->node_index[node] = idx;
        if (B > 1) {
            int y[176];
            int N0 = N / B, blk, j, cm = 0;
            cwrsi(N, K, idx, y);
            for (blk = 0; blk < B; blk++) {
                for (j = 0; j < N0; j++) {
                    if (y[blk * N0 + j]) {
                        cm |= 1 << blk;
                        break;
                    }
                }
            }
            return cm;
        }
        return 1;
    }
    o->node_kind[node] = NODE_ZERO;
    o->node_fill[node] = fill & ((1 << B) - 1);
    o->node_seed[node] = w->seed;
    fill &= (1 << B) - 1;
    if (!fill)
        return 0;
    {
        u32 sd = w->seed;
        int j;
        for (j = 0; j < N; j++)
            sd = lcg(sd);
        w->seed = sd;
    }
    if (o->band_eff[i] < 0)
        return (1 << B) - 1;
    return fill;
}

/* rate.c:248-532 */
static void interp_b2p(const Mode *m, int start, int end, int skip_start,
                       int *bits1, int *bits2, const int *thresh,
                       const int *cap, int total, int skip_rsv,
                       Dec *d, int *bits, int *ebits, int *fine_pri,
                       int *coded_bands_o, int *balance_o)
{
    const int *e_bands = m->e_bands;
    int alloc_floor = 1 << BITRES;     /* C = 1 */
    int logM = (m->lm) << BITRES;      /* lm stored in Mode */
    int lo = 0, hi = 1 << ALLOC_STEPS, i, j, psum, done, mid;
    int coded_bands, left, percoeff, balance;
    for (i = 0; i < ALLOC_STEPS; i++) {
        mid = (lo + hi) >> 1;
        psum = 0;
        done = 0;
        for (j = end - 1; j >= start; j--) {
            int tmp = bits1[j] + ((mid * bits2[j]) >> ALLOC_STEPS);
            if (tmp >= thresh[j] || done) {
                done = 1;
                psum += tmp < cap[j] ? tmp : cap[j];
            } else if (tmp >= alloc_floor)
                psum += alloc_floor;
        }
        if (psum > total)
            hi = mid;
        else
            lo = mid;
    }
    psum = 0;
    done = 0;
    for (j = end - 1; j >= start; j--) {
        int tmp = bits1[j] + ((lo * bits2[j]) >> ALLOC_STEPS);
        if (tmp < thresh[j] && !done)
            tmp = tmp >= alloc_floor ? alloc_floor : 0;
        else
            done = 1;
        tmp = tmp < cap[j] ? tmp : cap[j];
        bits[j] = tmp;
        psum += tmp;
    }
    coded_bands = end;
    for (;;) {
        int band_width, band_bits, rem, thr;
        j = coded_bands - 1;
        if (j <= skip_start) {
            total += skip_rsv;
            break;
        }
        left = total - psum;
        percoeff = left / (e_bands[coded_bands] - e_bands[start]);
        left -= (e_bands[coded_bands] - e_bands[start]) * percoeff;
        rem = left - (e_bands[j] - e_bands[start]);
        if (rem < 0)
            rem = 0;
        band_width = e_bands[coded_bands] - e_bands[j];
        band_bits = bits[j] + percoeff * band_width + rem;
        thr = alloc_floor + (1 << BITRES);
        if (band_bits >= (thresh[j] > thr ? thresh[j] : thr)) {
            if (dbit_logp(d, 1))
                break;
            psum += 1 << BITRES;
            band_bits -= 1 << BITRES;
        }
        psum -= bits[j];
        if (band_bits >= alloc_floor) {
            psum += alloc_floor;
            bits[j] = alloc_floor;
        } else
            bits[j] = 0;
        coded_bands--;
    }
    /* C == 1: no intensity/dual symbols */
    left = total - psum;
    percoeff = left / (e_bands[coded_bands] - e_bands[start]);
    left -= (e_bands[coded_bands] - e_bands[start]) * percoeff;
    for (j = start; j < coded_bands; j++)
        bits[j] += percoeff * (e_bands[j + 1] - e_bands[j]);
    for (j = start; j < coded_bands; j++) {
        int tmp = e_bands[j + 1] - e_bands[j];
        if (tmp > left)
            tmp = left;
        bits[j] += tmp;
        left -= tmp;
    }
    balance = 0;
    for (j = start; j < coded_bands; j++) {
        int N0 = e_bands[j + 1] - e_bands[j];
        int N = N0 << m->lm;
        int bit = bits[j] + balance, excess = 0;
        if (N > 1) {
            int den, NClogN, offset, eb;
            excess = bit - cap[j];
            if (excess < 0)
                excess = 0;
            bits[j] = bit - excess;
            den = N;
            NClogN = den * (m->log_n[j] + logM);
            offset = (NClogN >> 1) - den * FINE_OFFSET;
            if (N == 2)
                offset += (den << BITRES) >> 2;
            if (bits[j] + offset < (den * 2) << BITRES)
                offset += NClogN >> 2;
            else if (bits[j] + offset < (den * 3) << BITRES)
                offset += NClogN >> 3;
            eb = bits[j] + offset + (den << (BITRES - 1));
            if (eb < 0)
                eb = 0;
            eb = (eb / den) >> BITRES;
            if (eb > (bits[j] >> BITRES))
                eb = bits[j] >> BITRES;
            if (eb > MAX_FINE_BITS)
                eb = MAX_FINE_BITS;
            ebits[j] = eb;
            fine_pri[j] = eb * (den << BITRES) >= bits[j] + offset;
            bits[j] -= eb << BITRES;
        } else {
            excess = bit - (1 << BITRES);
            if (excess < 0)
                excess = 0;
            bits[j] = bit - excess;
            ebits[j] = 0;
            fine_pri[j] = 1;
        }
        if (excess > 0) {
            int extra_fine = excess >> BITRES;
            int extra_bits;
            if (extra_fine > MAX_FINE_BITS - ebits[j])
                extra_fine = MAX_FINE_BITS - ebits[j];
            ebits[j] += extra_fine;
            extra_bits = extra_fine << BITRES;
            fine_pri[j] = extra_bits >= excess - balance;
            excess -= extra_bits;
        }
        balance = excess;
    }
    for (j = coded_bands; j < end; j++) {
        ebits[j] = bits[j] >> BITRES;
        bits[j] = 0;
        fine_pri[j] = ebits[j] < 1;
    }
    *coded_bands_o = coded_bands;
    *balance_o = balance;
}

/* rate.c:534-645 (C == 1) */
static void compute_alloc(const Mode *m, int start, int end,
                          const int *offsets, const int *cap, int trim,
                          int total, Dec *d, int *bits, int *ebits,
                          int *fine_pri, int *coded_bands, int *balance)
{
    int nb = m->nb;
    const int *e_bands = m->e_bands;
    int skip_start = start, skip_rsv, lo, hi, j;
    int thresh[32], trim_off[32], bits1[32], bits2[32];
    if (total < 0)
        total = 0;
    skip_rsv = total >= (1 << BITRES) ? (1 << BITRES) : 0;
    total -= skip_rsv;
    for (j = start; j < end; j++) {
        int width = e_bands[j + 1] - e_bands[j];
        int t = (3 * width << m->lm << BITRES) >> 4;
        thresh[j] = t > (1 << BITRES) ? t : (1 << BITRES);
        trim_off[j] = (width * (trim - 5 - m->lm) * (end - j - 1)
                       * (1 << (m->lm + BITRES))) >> 6;
        if ((width << m->lm) == 1)
            trim_off[j] -= 1 << BITRES;
    }
    lo = 1;
    hi = m->n_alloc - 1;
    while (lo <= hi) {
        int done = 0, psum = 0, mid = (lo + hi) >> 1;
        for (j = end - 1; j >= start; j--) {
            int N = e_bands[j + 1] - e_bands[j];
            int bitsj = (N * (int)m->alloc_vectors[mid * nb + j]
                         << m->lm) >> 2;
            if (bitsj > 0) {
                bitsj += trim_off[j];
                if (bitsj < 0)
                    bitsj = 0;
            }
            bitsj += offsets[j];
            if (bitsj >= thresh[j] || done) {
                done = 1;
                psum += bitsj < cap[j] ? bitsj : cap[j];
            } else if (bitsj >= 1 << BITRES)
                psum += 1 << BITRES;
        }
        if (psum > total)
            hi = mid - 1;
        else
            lo = mid + 1;
    }
    hi = lo;
    lo -= 1;
    for (j = start; j < end; j++) {
        int N = e_bands[j + 1] - e_bands[j];
        int b1 = (N * (int)m->alloc_vectors[lo * nb + j] << m->lm) >> 2;
        int b2 = hi >= m->n_alloc ? cap[j]
            : (N * (int)m->alloc_vectors[hi * nb + j] << m->lm) >> 2;
        if (b1 > 0) {
            b1 += trim_off[j];
            if (b1 < 0)
                b1 = 0;
        }
        if (b2 > 0) {
            b2 += trim_off[j];
            if (b2 < 0)
                b2 = 0;
        }
        if (lo > 0)
            b1 += offsets[j];
        b2 += offsets[j];
        if (offsets[j] > 0)
            skip_start = j;
        b2 -= b1;
        if (b2 < 0)
            b2 = 0;
        bits1[j] = b1;
        bits2[j] = b2;
    }
    interp_b2p(m, start, end, skip_start, bits1, bits2, thresh, cap,
               total, skip_rsv, d, bits, ebits, fine_pri, coded_bands,
               balance);
}

/* tf_decode (celt_decoder.c:460-497) */
static void tf_dec(Dec *d, int start, int end, int is_transient, int lm,
                   int *tf_res)
{
    int budget = d->storage * 8;
    int tell = dtell(d);
    int logp = is_transient ? 2 : 4;
    int tf_select_rsv = lm > 0 && tell + logp + 1 <= budget;
    int tf_changed = 0, curr = 0, i, tf_select = 0;
    int ist = is_transient ? 1 : 0;
    budget -= tf_select_rsv;
    for (i = start; i < end; i++) {
        if (tell + logp <= budget) {
            curr ^= dbit_logp(d, logp);
            tell = dtell(d);
            tf_changed |= curr;
        }
        tf_res[i] = curr;
        logp = is_transient ? 4 : 5;
    }
    if (tf_select_rsv
        && TF_SELECT_TABLE[lm][4 * ist + 0 + tf_changed]
        != TF_SELECT_TABLE[lm][4 * ist + 2 + tf_changed])
        tf_select = dbit_logp(d, 1);
    for (i = start; i < end; i++)
        tf_res[i] = TF_SELECT_TABLE[lm][4 * ist + 2 * tf_select
                                        + tf_res[i]];
}

/* ---- full frame parse ------------------------------------------- */
/* scal layout: 0 silence, 1 pf_pitch, 2 pf_qg, 3 pf_tapset,
 * 4 transient, 5 intra, 6 spread, 7 dual_stereo, 8 intensity,
 * 9 anti_collapse_on, 10 final_range (u32 bits), 11 seed_after,
 * 12 error */
int celt_dry_parse_batch(
    const u8 *data, const long long *offs, const u32 *seeds, int B,
    int lm, int nb, int n_nodes, int n_alloc,
    const int *e_bands, const u8 *alloc_vectors, const int *log_n,
    const int *cache_index, const u8 *cache_bits, const int *caps,
    const u8 *e_prob, const int *band_first, const int *node_child,
    /* outputs: [B * ...] */
    int *scal, int *qi, int *tf_res, int *fine_q, int *fine_bits,
    int *pulses, int *sign_n1, int *finalise, int *band_B,
    int *band_recomb, int *band_tdiv, int *band_eff, int *cmasks,
    int *node_kind, int *node_k, int *node_itheta, int *node_fill,
    u32 *node_index, u32 *node_seed);

static int parse_frame_c(const Mode *m, int lm, const u8 *data,
                         int length, u32 seed0, Out *o)
{
    Dec dd, *d = &dd;
    int nb = m->nb;
    int M = 1 << lm;
    int total_bits = length * 8;
    int tell, silence, i, j;
    int shortBlocks, intra, spread, trim;
    int offsets[32], cap[32];
    int bits[32], ebits[32], fine_pri[32];
    int coded_bands, balance0;
    int tf[32];
    int bitsleft, anti_rsv;
    int total_bits_frac, tell_frac, dynalloc_logp;
    Walk w;
    long long bits_q3;

    if (length > 1275)
        return 1;
    dinit(d, data, length);

    for (i = 0; i < nb; i++) {
        o->qi[i] = 0;
        o->tf_res[i] = 0;
        o->fine_q[i] = -1;
        o->fine_bits[i] = 0;
        o->finalise[i] = -1;
        o->finalise[nb + i] = -1;
        o->pulses[i] = 0;
        o->sign_n1[i] = -1;
        o->band_B[i] = 1;
        o->band_recomb[i] = 0;
        o->band_tdiv[i] = 0;
        o->band_eff[i] = -1;
        o->cmasks[i] = 0;
    }
    for (i = 0; i < m->n_nodes; i++) {
        o->node_kind[i] = NODE_NONE;
        o->node_k[i] = 0;
        o->node_itheta[i] = 0;
        o->node_fill[i] = 0;
        o->node_index[i] = 0;
        o->node_seed[i] = 0;
    }
    memset(o->scal, 0, 13 * sizeof(int));
    o->scal[2] = -1;               /* pf_qg */

    tell = dtell(d);
    if (tell >= total_bits)
        silence = 1;
    else if (tell == 1)
        silence = dbit_logp(d, 15);
    else
        silence = 0;
    o->scal[0] = silence;
    if (silence) {
        tell = length * 8;
        d->nbits_total += tell - dtell(d);
    }
    if (tell + 16 <= total_bits) {
        if (dbit_logp(d, 1)) {
            int octave = (int)duint(d, 6);
            o->scal[1] = (16 << octave) + (int)dbits(d, 4 + octave) - 1;
            o->scal[2] = (int)dbits(d, 3);
            if (dtell(d) + 2 <= total_bits)
                o->scal[3] = dicdf(d, TAPSET_ICDF, 2);
        }
        tell = dtell(d);
    }
    if (lm > 0 && tell + 3 <= total_bits) {
        o->scal[4] = dbit_logp(d, 3);
        tell = dtell(d);
    }
    shortBlocks = o->scal[4] ? M : 0;
    intra = tell + 3 <= total_bits ? dbit_logp(d, 3) : 0;
    o->scal[5] = intra;

    /* coarse energy */
    {
        const u8 *pm = m->e_prob + (intra ? 42 : 0);
        for (i = 0; i < nb; i++) {
            int t2 = dtell(d), qiv;
            if (total_bits - t2 >= 15) {
                int pi = 2 * (i < 20 ? i : 20);
                qiv = laplace_dec(d, (int)pm[pi] << 7,
                                  (int)pm[pi + 1] << 6);
            } else if (total_bits - t2 >= 2) {
                qiv = dicdf(d, SMALL_ENERGY_ICDF, 2);
                qiv = (qiv >> 1) ^ -(qiv & 1);
            } else if (total_bits - t2 >= 1) {
                qiv = -dbit_logp(d, 1);
            } else
                qiv = -1;
            o->qi[i] = qiv;
        }
    }

    tf_dec(d, 0, nb, o->scal[4], lm, tf);
    for (i = 0; i < nb; i++)
        o->tf_res[i] = tf[i];

    tell = dtell(d);
    spread = 2;                     /* SPREAD_NORMAL */
    if (tell + 4 <= total_bits)
        spread = dicdf(d, SPREAD_ICDF, 5);
    o->scal[6] = spread;

    for (i = 0; i < nb; i++)
        cap[i] = m->caps[i];
    dynalloc_logp = 6;
    total_bits_frac = total_bits << BITRES;
    tell_frac = dtell_frac(d);
    for (i = 0; i < nb; i++) {
        int width = (m->e_bands[i + 1] - m->e_bands[i]) << lm;
        int quanta = width << BITRES;
        int six = 6 << BITRES;
        int boost = 0, loop_logp = dynalloc_logp;
        if (quanta > (six > width ? six : width))
            quanta = six > width ? six : width;
        while (tell_frac + (loop_logp << BITRES) < total_bits_frac
               && boost < cap[i]) {
            int flag = dbit_logp(d, loop_logp);
            tell_frac = dtell_frac(d);
            if (!flag)
                break;
            boost += quanta;
            total_bits_frac -= quanta;
            loop_logp = 1;
        }
        offsets[i] = boost;
        if (boost > 0)
            dynalloc_logp = dynalloc_logp - 1 > 2
                ? dynalloc_logp - 1 : 2;
    }

    trim = 5;
    if (tell_frac + (6 << BITRES) <= total_bits_frac)
        trim = dicdf(d, TRIM_ICDF, 7);

    bits_q3 = ((long long)length * 8 << BITRES) - dtell_frac(d) - 1;
    anti_rsv = (o->scal[4] && lm >= 2
                && bits_q3 >= ((long long)(lm + 2) << BITRES))
        ? (1 << BITRES) : 0;
    bits_q3 -= anti_rsv;

    compute_alloc(m, 0, nb, offsets, cap, trim, (int)bits_q3, d,
                  bits, ebits, fine_pri, &coded_bands, &balance0);
    for (i = 0; i < nb; i++) {
        o->pulses[i] = bits[i];
        o->fine_bits[i] = ebits[i];
    }
    o->scal[7] = 0;                 /* dual_stereo */
    o->scal[8] = 0;                 /* intensity */

    for (i = 0; i < nb; i++)
        if (ebits[i] > 0)
            o->fine_q[i] = (int)dbits(d, ebits[i]);

    /* band walk (quant_all_bands decode, mono) */
    {
        int B = shortBlocks ? M : 1;
        int norm_offset = 0;
        long long total_q3 = (long long)length * (8 << BITRES)
            - anti_rsv;
        int balance = balance0;
        int lowband_offset = 0, update_lowband = 1;
        int collapse[32];
        memset(collapse, 0, sizeof(collapse));
        w.m = m;
        w.dec = d;
        w.o = o;
        w.seed = seed0;
        for (i = 0; i < nb; i++) {
            int N = M * (m->e_bands[i + 1] - m->e_bands[i]);
            int tellf = dtell_frac(d);
            int b, tf_change, effective_lowband, x_cm, node0;
            if (i != 0)
                balance -= tellf;
            w.remaining_bits = (int)(total_q3 - tellf - 1);
            if (i <= coded_bands - 1) {
                int den = coded_bands - i < 3 ? coded_bands - i : 3;
                int curr_balance = balance / den;
                b = w.remaining_bits + 1;
                if (bits[i] + curr_balance < b)
                    b = bits[i] + curr_balance;
                if (b > 16383)
                    b = 16383;
                if (b < 0)
                    b = 0;
            } else
                b = 0;
            if ((M * m->e_bands[i] - N >= M * m->e_bands[0]
                 || i == 1)
                && (update_lowband || lowband_offset == 0))
                lowband_offset = i;
            tf_change = o->tf_res[i];
            effective_lowband = -1;
            if (lowband_offset != 0
                && (spread != 3 || B > 1 || tf_change < 0)) {
                int fold_start, fold_end, fold_i;
                effective_lowband =
                    M * m->e_bands[lowband_offset] - norm_offset - N;
                if (effective_lowband < 0)
                    effective_lowband = 0;
                fold_start = lowband_offset;
                while (M * m->e_bands[fold_start - 1]
                       > effective_lowband + norm_offset)
                    fold_start--;
                fold_end = lowband_offset - 1;
                do {
                    fold_end++;
                } while (fold_end < i
                         && M * m->e_bands[fold_end]
                         < effective_lowband + norm_offset + N);
                x_cm = 0;
                fold_i = fold_start;
                do {
                    x_cm |= collapse[fold_i];
                    fold_i++;
                } while (fold_i < fold_end);
            } else
                x_cm = (1 << B) - 1;
            o->band_eff[i] = effective_lowband;

            w.band = i;
            node0 = m->band_first[i];
            if (N == 1) {
                int sign = 0;
                if (w.remaining_bits >= 1 << BITRES) {
                    sign = (int)dbits(d, 1);
                    w.remaining_bits -= 1 << BITRES;
                }
                o->sign_n1[i] = sign;
                o->node_kind[node0] = NODE_PVQ;
                x_cm = 1;
            } else {
                int N_B = N / B, B_band = B;
                int recombine = tf_change > 0 ? tf_change : 0;
                int B2, N_B2, time_divide = 0, tfc, fill, Bf, N_Bf, k2;
                int cm, Bq, N_Bq;
                B2 = B_band >> recombine;
                N_B2 = N_B << recombine;
                tfc = tf_change;
                while ((N_B2 & 1) == 0 && tfc < 0) {
                    B2 <<= 1;
                    N_B2 >>= 1;
                    time_divide++;
                    tfc++;
                }
                o->band_B[i] = B2;
                o->band_recomb[i] = recombine;
                o->band_tdiv[i] = time_divide;
                fill = x_cm;
                for (k2 = 0; k2 < recombine; k2++)
                    fill = BIT_INTERLEAVE[fill & 0xF]
                        | (BIT_INTERLEAVE[fill >> 4] << 2);
                Bf = B_band >> recombine;
                N_Bf = N_B << recombine;
                tfc = tf_change;
                while ((N_Bf & 1) == 0 && tfc < 0) {
                    fill |= fill << Bf;
                    Bf <<= 1;
                    N_Bf >>= 1;
                    tfc++;
                }
                x_cm = partition(&w, node0, N, b, B2, lm, fill);
                cm = x_cm;
                Bq = B2;
                N_Bq = N_B2;
                for (k2 = 0; k2 < time_divide; k2++) {
                    Bq >>= 1;
                    N_Bq <<= 1;
                    cm |= cm >> Bq;
                }
                for (k2 = 0; k2 < recombine; k2++)
                    cm = BIT_DEINTERLEAVE[cm & 0xF];
                Bq <<= recombine;
                cm &= (1 << Bq) - 1;
                x_cm = cm;
            }
            collapse[i] = x_cm & 0xFF;
            balance += bits[i] + tellf;
            update_lowband = b > (N << BITRES);
        }
        for (i = 0; i < nb; i++)
            o->cmasks[i] = collapse[i];
        o->scal[11] = (int)w.seed;
    }

    if (anti_rsv > 0)
        o->scal[9] = (int)dbits(d, 1);

    bitsleft = length * 8 - dtell(d);
    for (j = 0; j < 2; j++) {
        for (i = 0; i < nb; i++) {
            if (bitsleft < 1)
                break;
            if (ebits[i] >= 8 || fine_pri[i] != j)
                continue;
            o->finalise[j * nb + i] = (int)dbits(d, 1);
            bitsleft -= 1;
        }
    }
    o->scal[10] = (int)d->rng;
    if (dtell(d) > 8 * length)
        return 3;
    return 0;
}

int celt_dry_parse_batch(
    const u8 *data, const long long *offs, const u32 *seeds, int B,
    int lm, int nb, int n_nodes, int n_alloc,
    const int *e_bands, const u8 *alloc_vectors, const int *log_n,
    const int *cache_index, const u8 *cache_bits, const int *caps,
    const u8 *e_prob, const int *band_first, const int *node_child,
    int *scal, int *qi, int *tf_res, int *fine_q, int *fine_bits,
    int *pulses, int *sign_n1, int *finalise, int *band_B,
    int *band_recomb, int *band_tdiv, int *band_eff, int *cmasks,
    int *node_kind, int *node_k, int *node_itheta, int *node_fill,
    u32 *node_index, u32 *node_seed)
{
    int b;
    Mode m;
    m.lm = lm;
    m.nb = nb;
    m.n_nodes = n_nodes;
    m.n_alloc = n_alloc;
    m.e_bands = e_bands;
    m.alloc_vectors = alloc_vectors;
    m.log_n = log_n;
    m.cache_index = cache_index;
    m.cache_bits = cache_bits;
    m.caps = caps;
    m.e_prob = e_prob;
    m.band_first = band_first;
    m.node_child = node_child;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (b = 0; b < B; b++) {
        Out o;
        int rc;
        o.scal = scal + b * 13;
        o.qi = qi + b * nb;
        o.tf_res = tf_res + b * nb;
        o.fine_q = fine_q + b * nb;
        o.fine_bits = fine_bits + b * nb;
        o.pulses = pulses + b * nb;
        o.sign_n1 = sign_n1 + b * nb;
        o.finalise = finalise + b * 2 * nb;
        o.band_B = band_B + b * nb;
        o.band_recomb = band_recomb + b * nb;
        o.band_tdiv = band_tdiv + b * nb;
        o.band_eff = band_eff + b * nb;
        o.cmasks = cmasks + b * nb;
        o.node_kind = node_kind + b * n_nodes;
        o.node_k = node_k + b * n_nodes;
        o.node_itheta = node_itheta + b * n_nodes;
        o.node_fill = node_fill + b * n_nodes;
        o.node_index = node_index + b * n_nodes;
        o.node_seed = node_seed + b * n_nodes;
        rc = parse_frame_c(&m, lm, data + offs[b],
                           (int)(offs[b + 1] - offs[b]), seeds[b], &o);
        o.scal[12] = rc;
    }
    return 0;
}
