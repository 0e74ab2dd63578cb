#include <stdio.h>
#include "main.h"
#include "Inlines.h"
int main(void){
  opus_int32 gains[4] = {23855104, 3288334, 65536, 123456789};
  int i;
  for(i=0;i<4;i++)
    printf("g=%d inv47=%d div16=%d\n", gains[i],
           silk_INVERSE32_varQ(gains[i],47),
           silk_DIV32_varQ(65536, gains[i], 16));
  printf("smulww: %d %d\n", silk_SMULWW(-123456789, 98765),
         silk_SMULWW(2100000000, -77));
  return 0;
}
