/* Oracle harness: drive libopus's opus_packet_extensions_* and print
   hex, for byte-exact comparison with opus_codec_tpu.opus.extensions.
   Scenarios are fixed; output format: one line per scenario:
   GEN <hex>  then PARSE <id>:<frame>:<hex> ... */
#include <stdio.h>
#include <string.h>
#include "opus.h"
#include "opus_types.h"

typedef struct {
    int id;
    int frame;
    const unsigned char *data;
    opus_int32 len;
} opus_extension_data;

extern opus_int32 opus_packet_extensions_generate(unsigned char *data,
    opus_int32 len, const opus_extension_data *extensions,
    opus_int32 nb_extensions, int pad);
extern opus_int32 opus_packet_extensions_parse(const unsigned char *data,
    opus_int32 len, opus_extension_data *extensions,
    opus_int32 *nb_extensions);
extern opus_int32 opus_packet_extensions_count(const unsigned char *data,
    opus_int32 len);

static void hex(const unsigned char *d, int n) {
    int i;
    for (i = 0; i < n; i++) printf("%02x", d[i]);
}

static void scenario(const opus_extension_data *ext, int n, int size,
                     int pad) {
    unsigned char buf[4096];
    opus_extension_data out[16];
    opus_int32 nb = 16, len, i;
    len = opus_packet_extensions_generate(buf, size, ext, n, pad);
    printf("GEN %d ", (int)len);
    if (len >= 0) hex(buf, len);
    printf("\n");
    if (len < 0) return;
    printf("COUNT %d\n", (int)opus_packet_extensions_count(buf, len));
    if (opus_packet_extensions_parse(buf, len, out, &nb) == 0) {
        for (i = 0; i < nb; i++) {
            printf("PARSE %d %d ", out[i].id, out[i].frame);
            hex(out[i].data, out[i].len);
            printf("\n");
        }
    } else printf("PARSE_ERR\n");
}

int main(void) {
    static const unsigned char dred[300] = "DRED-PAYLOAD-0123456789";
    {
        opus_extension_data e[] = {
            {2, 0, (const unsigned char *)"a", 1},
            {32, 10, (const unsigned char *)"DRED", 4},
            {33, 1, (const unsigned char *)"NOT DRED", 8},
            {3, 4, (const unsigned char *)"", 0}};
        scenario(e, 4, 32, 1);
    }
    {
        opus_extension_data e[] = {
            {126, 0, dred, 260}};
        scenario(e, 1, 262, 0);
    }
    {
        opus_extension_data e[] = {
            {127, 0, dred, 255},
            {5, 0, (const unsigned char *)"x", 1}};
        scenario(e, 2, 300, 1);
    }
    {
        opus_extension_data e[] = {
            {40, 2, dred, 10},
            {41, 2, dred, 3},
            {7, 0, (const unsigned char *)"", 0}};
        scenario(e, 3, 40, 1);
    }
    return 0;
}
