/* Native host lane: range-coder plan execution.
 *
 * The TPU device computes per-stream symbol PLANS (arrays of integer ops);
 * this C lane turns plans into Opus packets and back at native speed. It is
 * the production path for the batched pipeline; the Python range coder in
 * bitstream/range_coder.py is the scalar ground truth it is tested against
 * byte-for-byte.
 *
 * Behavioural parity: RFC 6716 section 4.1 range coder (same state machine
 * as reference entenc.c/entdec.c); implementation is a C translation of our
 * validated Python module, not of the reference sources.
 *
 * Op encoding (int32 x 4 per op: kind, a, b, c):
 *   0: encode(fl=a, fh=b, ft=c)         decode: ft=c -> returns fl
 *   1: encode_bin(fl=a, fh=b, bits=c)
 *   2: bit_logp(val=a, logp=c)
 *   3: icdf(sym=a, table_offset=b, ftb=c)  [tables in aux byte array]
 *   4: uint(val=a, ft=c)
 *   5: bits(val=a, nbits=c)
 * Decode fills op.a with the decoded symbol.
 */
#include <stdint.h>
#include <string.h>

#define SYM_BITS 8
#define CODE_BITS 32
#define SYM_MAX ((1u << SYM_BITS) - 1)
#define CODE_SHIFT (CODE_BITS - SYM_BITS - 1)
#define CODE_TOP (1u << (CODE_BITS - 1))
#define CODE_BOT (CODE_TOP >> SYM_BITS)
#define CODE_EXTRA ((CODE_BITS - 2) % SYM_BITS + 1)
#define WINDOW_SIZE 32
#define UINT_BITS 8

typedef struct {
  unsigned char *buf;
  uint32_t storage, end_offs, offs, rng, val, ext;
  uint32_t end_window;
  int nend_bits, nbits_total, rem, error;
} ec_ctx;

static int ilog(uint32_t v) {
  int r = 0;
  while (v) { r++; v >>= 1; }
  return r;
}

/* ---------------- encoder ---------------- */

static void enc_init(ec_ctx *e, unsigned char *buf, uint32_t size) {
  memset(e, 0, sizeof(*e));
  e->buf = buf;
  e->storage = size;
  e->nbits_total = CODE_BITS + 1;
  e->rng = CODE_TOP;
  e->rem = -1;
}

static int wbyte(ec_ctx *e, unsigned v) {
  if (e->offs + e->end_offs >= e->storage) return -1;
  e->buf[e->offs++] = (unsigned char)v;
  return 0;
}

static int wbyte_end(ec_ctx *e, unsigned v) {
  if (e->offs + e->end_offs >= e->storage) return -1;
  e->buf[e->storage - ++(e->end_offs)] = (unsigned char)v;
  return 0;
}

static void carry_out(ec_ctx *e, int c) {
  if (c != (int)SYM_MAX) {
    int carry = c >> SYM_BITS;
    if (e->rem >= 0) e->error |= wbyte(e, e->rem + carry);
    if (e->ext > 0) {
      unsigned sym = (SYM_MAX + carry) & SYM_MAX;
      do e->error |= wbyte(e, sym);
      while (--(e->ext) > 0);
    }
    e->rem = c & SYM_MAX;
  } else
    e->ext++;
}

static void enc_normalize(ec_ctx *e) {
  while (e->rng <= CODE_BOT) {
    carry_out(e, (int)(e->val >> CODE_SHIFT));
    e->val = (e->val << SYM_BITS) & (CODE_TOP - 1);
    e->rng <<= SYM_BITS;
    e->nbits_total += SYM_BITS;
  }
}

static void enc_encode(ec_ctx *e, unsigned fl, unsigned fh, unsigned ft) {
  uint32_t r = e->rng / ft;
  if (fl > 0) {
    e->val += e->rng - r * (ft - fl);
    e->rng = r * (fh - fl);
  } else
    e->rng -= r * (ft - fh);
  enc_normalize(e);
}

static void enc_encode_bin(ec_ctx *e, unsigned fl, unsigned fh,
                           unsigned bits) {
  uint32_t r = e->rng >> bits;
  if (fl > 0) {
    e->val += e->rng - r * ((1u << bits) - fl);
    e->rng = r * (fh - fl);
  } else
    e->rng -= r * ((1u << bits) - fh);
  enc_normalize(e);
}

static void enc_bit_logp(ec_ctx *e, int val, unsigned logp) {
  uint32_t r = e->rng;
  uint32_t s = r >> logp;
  r -= s;
  if (val) e->val += r;
  e->rng = val ? s : r;
  enc_normalize(e);
}

static void enc_icdf(ec_ctx *e, int s, const unsigned char *icdf,
                     unsigned ftb) {
  uint32_t r = e->rng >> ftb;
  if (s > 0) {
    e->val += e->rng - r * icdf[s - 1];
    e->rng = r * (icdf[s - 1] - icdf[s]);
  } else
    e->rng -= r * icdf[s];
  enc_normalize(e);
}

static void enc_bits(ec_ctx *e, uint32_t fl, unsigned bits) {
  uint32_t window = e->end_window;
  int used = e->nend_bits;
  if (used + (int)bits > WINDOW_SIZE) {
    do {
      e->error |= wbyte_end(e, window & SYM_MAX);
      window >>= SYM_BITS;
      used -= SYM_BITS;
    } while (used >= SYM_BITS);
  }
  window |= fl << used;
  used += bits;
  e->end_window = window;
  e->nend_bits = used;
  e->nbits_total += bits;
}

static void enc_uint(ec_ctx *e, uint32_t fl, uint32_t ft) {
  int ftb;
  ft--;
  ftb = ilog(ft);
  if (ftb > UINT_BITS) {
    ftb -= UINT_BITS;
    enc_encode(e, fl >> ftb, (fl >> ftb) + 1, (ft >> ftb) + 1);
    enc_bits(e, fl & ((1u << ftb) - 1), ftb);
  } else
    enc_encode(e, fl, fl + 1, ft + 1);
}

static void enc_done(ec_ctx *e) {
  uint32_t window, msk, end;
  int used, l;
  l = CODE_BITS - ilog(e->rng);
  msk = (CODE_TOP - 1) >> l;
  end = (e->val + msk) & ~msk;
  if ((end | msk) >= e->val + e->rng) {
    l++;
    msk >>= 1;
    end = (e->val + msk) & ~msk;
  }
  while (l > 0) {
    carry_out(e, (int)(end >> CODE_SHIFT));
    end = (end << SYM_BITS) & (CODE_TOP - 1);
    l -= SYM_BITS;
  }
  if (e->rem >= 0 || e->ext > 0) carry_out(e, 0);
  window = e->end_window;
  used = e->nend_bits;
  while (used >= SYM_BITS) {
    e->error |= wbyte_end(e, window & SYM_MAX);
    window >>= SYM_BITS;
    used -= SYM_BITS;
  }
  if (!e->error) {
    memset(e->buf + e->offs, 0, e->storage - e->offs - e->end_offs);
    if (used > 0) {
      if (e->end_offs >= e->storage)
        e->error = -1;
      else {
        l = -l;
        if (e->offs + e->end_offs >= e->storage && l < used) {
          window &= (1u << l) - 1;
          e->error = -1;
        }
        e->buf[e->storage - e->end_offs - 1] |= (unsigned char)window;
      }
    }
  }
}

/* ---------------- decoder ---------------- */

static int rbyte(ec_ctx *d) {
  return d->offs < d->storage ? d->buf[d->offs++] : 0;
}

static int rbyte_end(ec_ctx *d) {
  return d->end_offs < d->storage
             ? d->buf[d->storage - ++(d->end_offs)]
             : 0;
}

static void dec_normalize(ec_ctx *d) {
  while (d->rng <= CODE_BOT) {
    int sym;
    d->nbits_total += SYM_BITS;
    d->rng <<= SYM_BITS;
    sym = d->rem;
    d->rem = rbyte(d);
    sym = (sym << SYM_BITS | d->rem) >> (SYM_BITS - CODE_EXTRA);
    d->val = ((d->val << SYM_BITS) + (SYM_MAX & ~sym)) & (CODE_TOP - 1);
  }
}

static void dec_init(ec_ctx *d, unsigned char *buf, uint32_t storage) {
  memset(d, 0, sizeof(*d));
  d->buf = buf;
  d->storage = storage;
  d->nbits_total =
      CODE_BITS + 1 - ((CODE_BITS - CODE_EXTRA) / SYM_BITS) * SYM_BITS;
  d->rng = 1u << CODE_EXTRA;
  d->rem = rbyte(d);
  d->val = d->rng - 1 - (d->rem >> (SYM_BITS - CODE_EXTRA));
  dec_normalize(d);
}

static unsigned dec_decode(ec_ctx *d, unsigned ft) {
  unsigned s;
  d->ext = d->rng / ft;
  s = (unsigned)(d->val / d->ext);
  return ft - (s + 1 < ft ? s + 1 : ft);
}

static void dec_update(ec_ctx *d, unsigned fl, unsigned fh, unsigned ft) {
  uint32_t s = d->ext * (ft - fh);
  d->val -= s;
  d->rng = fl > 0 ? d->ext * (fh - fl) : d->rng - s;
  dec_normalize(d);
}

static int dec_bit_logp(ec_ctx *d, unsigned logp) {
  uint32_t r = d->rng, dd = d->val, s = r >> logp;
  int ret = dd < s;
  if (!ret) d->val = dd - s;
  d->rng = ret ? s : r - s;
  dec_normalize(d);
  return ret;
}

static int dec_icdf(ec_ctx *d, const unsigned char *icdf, unsigned ftb) {
  uint32_t t, s = d->rng, dd = d->val, r = s >> ftb;
  int ret = -1;
  do {
    t = s;
    s = r * icdf[++ret];
  } while (dd < s);
  d->val = dd - s;
  d->rng = t - s;
  dec_normalize(d);
  return ret;
}

static uint32_t dec_bits(ec_ctx *d, unsigned bits) {
  uint32_t window = d->end_window, ret;
  int available = d->nend_bits;
  if (available < (int)bits) {
    do {
      window |= (uint32_t)rbyte_end(d) << available;
      available += SYM_BITS;
    } while (available <= WINDOW_SIZE - SYM_BITS);
  }
  ret = window & ((1u << bits) - 1);
  window >>= bits;
  available -= bits;
  d->end_window = window;
  d->nend_bits = available;
  d->nbits_total += bits;
  return ret;
}

static uint32_t dec_uint(ec_ctx *d, uint32_t ft) {
  int ftb;
  unsigned s;
  ft--;
  ftb = ilog(ft);
  if (ftb > UINT_BITS) {
    uint32_t t;
    ftb -= UINT_BITS;
    s = dec_decode(d, (ft >> ftb) + 1);
    dec_update(d, s, s + 1, (ft >> ftb) + 1);
    t = (uint32_t)s << ftb | dec_bits(d, ftb);
    if (t <= ft) return t;
    d->error = 1;
    return ft;
  } else {
    ft++;
    s = dec_decode(d, ft);
    dec_update(d, s, s + 1, ft);
    return s;
  }
}

/* ---------------- plan execution (public API) ---------------- */

int ec_encode_plan(const int32_t *ops, int n_ops,
                   const unsigned char *tables, unsigned char *out,
                   int size, uint32_t *final_rng) {
  ec_ctx e;
  int i;
  enc_init(&e, out, size);
  for (i = 0; i < n_ops; i++) {
    int kind = ops[4 * i], a = ops[4 * i + 1], b = ops[4 * i + 2],
        c = ops[4 * i + 3];
    if (kind < 0) continue;      /* NOP row (masked-off lane) */
    switch (kind) {
      case 0: enc_encode(&e, a, b, c); break;
      case 1: enc_encode_bin(&e, a, b, c); break;
      case 2: enc_bit_logp(&e, a, c); break;
      case 3: enc_icdf(&e, a, tables + b, c); break;
      case 4: enc_uint(&e, a, c); break;
      case 5: enc_bits(&e, a, c); break;
      default: return -2;
    }
  }
  enc_done(&e);
  if (final_rng) *final_rng = e.rng;
  return e.error ? -1 : (int)(e.offs + e.end_offs);
}

int ec_decode_plan(int32_t *ops, int n_ops, const unsigned char *tables,
                   unsigned char *data, int len, uint32_t *final_rng) {
  ec_ctx d;
  int i;
  dec_init(&d, data, len);
  for (i = 0; i < n_ops; i++) {
    int kind = ops[4 * i], b = ops[4 * i + 2], c = ops[4 * i + 3];
    int sym = 0;
    switch (kind) {
      case 0: {
        unsigned s = dec_decode(&d, c);
        dec_update(&d, s, s + 1, c);
        sym = s;
      } break;
      case 2: sym = dec_bit_logp(&d, c); break;
      case 3: sym = dec_icdf(&d, tables + b, c); break;
      case 4: sym = dec_uint(&d, c); break;
      case 5: sym = dec_bits(&d, c); break;
      default: return -2;
    }
    ops[4 * i + 1] = sym;
  }
  if (final_rng) *final_rng = d.rng;
  return 0;
}

/* Batched multi-stream entry: encode B independent plans. Offsets select
 * each stream's op slice and output region; returns per-stream sizes. */
int ec_encode_plan_batch(const int32_t *ops, const int32_t *op_offsets,
                         int n_streams, const unsigned char *tables,
                         unsigned char *out, const int32_t *out_offsets,
                         int32_t *sizes, uint32_t *rngs) {
  int s;
  for (s = 0; s < n_streams; s++) {
    int n = op_offsets[s + 1] - op_offsets[s];
    int cap = out_offsets[s + 1] - out_offsets[s];
    int r = ec_encode_plan(ops + 4 * op_offsets[s], n, tables,
                           (unsigned char *)out + out_offsets[s], cap,
                           rngs ? rngs + s : 0);
    if (r < 0) return r;
    sizes[s] = r;
  }
  return 0;
}

/* Strided batch entry: ops laid out [B, max_ops, 4] with per-stream
 * counts and byte budgets (CBR frame sizes). OpenMP-parallel over
 * streams when compiled with -fopenmp — each stream's coder is fully
 * independent (the reference's thread-per-stream contract,
 * tests/multhithread.rs). */
int ec_encode_plan_batch_strided(const int32_t *ops, int max_ops,
                                 const int32_t *counts, int n_streams,
                                 unsigned char *out, int out_stride,
                                 const int32_t *sizes, int32_t *used,
                                 uint32_t *rngs) {
  int s;
  int err = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (s = 0; s < n_streams; s++) {
    int r = ec_encode_plan(ops + (size_t)4 * max_ops * s, counts[s], 0,
                           out + (size_t)out_stride * s, sizes[s],
                           rngs ? rngs + s : 0);
    if (r < 0) err = r;
    if (used) used[s] = r;
  }
  return err;
}
