/* Minimal primegen-compatible shim: enumerates primes with a simple sieve. */
#ifndef PRIMEGEN_SHIM_H
#define PRIMEGEN_SHIM_H
#include <stdint.h>
#include <stdlib.h>
typedef uint64_t uint64;
typedef struct { uint64 cur; } primegen;
static inline int pg_isprime(uint64 n){ if(n<2) return 0; for(uint64 d=2;d*d<=n;d++) if(n%d==0) return 0; return 1; }
static inline void primegen_init(primegen*pg){ pg->cur=1; }
static inline uint64 primegen_next(primegen*pg){ uint64 n=pg->cur+1; while(!pg_isprime(n)) n++; pg->cur=n; return n; }
static inline uint64 primegen_count(primegen*pg, uint64 to){ uint64 c=0; primegen t; primegen_init(&t); while(1){ uint64 p=primegen_next(&t); if(p>=to) break; c++; } return c; }
static inline uint64 primegen_skipto(primegen*pg, uint64 to){ pg->cur = to>1?to-1:1; return 0; }
#endif
