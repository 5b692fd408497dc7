/* Emit the glibc rand() byte sequence the reference's large scene consumes:
   srand(111); then 3 draws of (rand() & 0xff) per grid sphere, 30*16 spheres. */
#include <stdio.h>
#include <stdlib.h>
int main(void) {
    srand(111);
    for (int i = 0; i < 30*16; ++i) {
        int r = rand() & 0xff, g = rand() & 0xff, b = rand() & 0xff;
        printf("%d,%d,%d,\n", r, g, b);
    }
    return 0;
}
