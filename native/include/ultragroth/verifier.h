/* ultragroth-tpu public verifier ABI.
 *
 * Drop-in twin of the reference libultragroth verifier surface
 * (/root/reference/src/verifier.h signatures).  `proof`, `inputs` and
 * `verification_key` are null-terminated JSON strings.
 */
#ifndef ULTRAGROTH_TPU_VERIFIER_H
#define ULTRAGROTH_TPU_VERIFIER_H

#ifdef __cplusplus
extern "C" {
#endif

#define VERIFIER_VALID_PROOF   0x0
#define VERIFIER_INVALID_PROOF 0x1
#define VERIFIER_ERROR         0x2

int groth16_verify(
    const char *proof, const char *inputs, const char *verification_key,
    char *error_msg, unsigned long error_msg_maxsize);

int ultra_groth_verify(
    const char *proof, const char *inputs, const char *verification_key,
    char *error_msg, unsigned long error_msg_maxsize);

#ifdef __cplusplus
}
#endif

#endif /* ULTRAGROTH_TPU_VERIFIER_H */
