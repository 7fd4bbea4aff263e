/* Placeholder for the native .bz2 bitstream emitter (multi-table
 * Huffman grouping + selector MTF + bit splicing).  Populated by the
 * bz2 format codec; kept in the gold library build from the start so
 * the Makefile stays stable. */

int tpulc_gold_abi_version(void) { return 1; }
