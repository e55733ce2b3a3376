/* ultragroth-tpu public prover ABI.
 *
 * Drop-in twin of the reference libultragroth prover surface
 * (/root/reference/src/prover.h:15-236 signatures), backed by the
 * TPU-native JAX runtime embedded via CPython.  Link against
 * libultragroth.so (build: `make -C native`; bundle:
 * `scripts/package_library.sh`).
 *
 * All prove entry points write JSON into caller-provided buffers and
 * report sizes through in/out parameters; on PROVER_ERROR a message is
 * written to error_msg (truncated to error_msg_maxsize).
 */
#ifndef ULTRAGROTH_TPU_PROVER_H
#define ULTRAGROTH_TPU_PROVER_H

#ifdef __cplusplus
extern "C" {
#endif

/* Error codes (values shared with the reference ABI). */
#define PROVER_OK                     0x0
#define PROVER_ERROR                  0x1
#define PROVER_ERROR_SHORT_BUFFER     0x2
#define PROVER_INVALID_WITNESS_LENGTH 0x3

/* -- size queries -------------------------------------------------------- */

/* Minimum public-signals JSON buffer size for a zkey held in memory. */
int groth16_public_size_for_zkey_buf(
    const void *zkey_buffer, unsigned long long zkey_size,
    unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_public_size_for_zkey_buf(
    const void *zkey_buffer, unsigned long long zkey_size,
    unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);

/* Same, for a zkey on disk. */
int groth16_public_size_for_zkey_file(
    const char *zkey_fname, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_public_size_for_zkey_file(
    const char *zkey_fname, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);

/* Minimum proof JSON buffer size (constant per protocol). */
void groth16_proof_size(unsigned long long *proof_size);
void ultra_groth_proof_size(unsigned long long *proof_size);

/* -- one-shot provers ----------------------------------------------------- */

int groth16_prover(
    const void *zkey_buffer, unsigned long long zkey_size,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_prover(
    const void *zkey_buffer, unsigned long long zkey_size,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);

int groth16_prover_zkey_file(
    const char *zkey_file_path,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_prover_zkey_file(
    const char *zkey_file_path,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);

/* -- handle API: create once (zkey parse + device upload), prove many ----- */

int groth16_prover_create(
    void **prover_object, const void *zkey_buffer,
    unsigned long long zkey_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_prover_create(
    void **prover_object, const void *zkey_buffer,
    unsigned long long zkey_size,
    char *error_msg, unsigned long long error_msg_maxsize);

int groth16_prover_create_zkey_file(
    void **prover_object, const char *zkey_file_path,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_prover_create_zkey_file(
    void **prover_object, const char *zkey_file_path,
    char *error_msg, unsigned long long error_msg_maxsize);

int groth16_prover_prove(
    void *prover_object,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);
int ultra_groth_prover_prove(
    void *prover_object,
    const void *wtns_buffer, unsigned long long wtns_size,
    char *proof_buffer, unsigned long long *proof_size,
    char *public_buffer, unsigned long long *public_size,
    char *error_msg, unsigned long long error_msg_maxsize);

void groth16_prover_destroy(void *prover_object);
void ultra_groth_prover_destroy(void *prover_object);

#ifdef __cplusplus
}
#endif

#endif /* ULTRAGROTH_TPU_PROVER_H */
