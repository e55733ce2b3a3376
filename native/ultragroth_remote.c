/* ultragroth-tpu REMOTE prover client: the mobile-packaging twin.
 *
 * The reference packages an ON-DEVICE prover for iOS/Android
 * (/root/reference/scripts/create_xcframework.sh,
 * build_android_system.sh): mobile apps link libultragroth and prove
 * locally on the phone's CPU.  A TPU-native framework proves on a TPU
 * service instead, so the mobile deliverable is this thin client: it
 * exports the SAME prover.h ABI (create / prove / destroy, size
 * queries, short-buffer retry protocol — /root/reference/src/prover.h:
 * 15-236), but forwards the witness to the ultragroth_tpu proof server
 * (server.py; route parity with src/main_proofserver.cpp:36-40) and
 * returns the proof/public JSON it produced.  A wrapper that consumed
 * the reference library relinks against libultragroth_remote with no
 * source change.
 *
 * Mapping:
 *   - the zkey argument selects the CIRCUIT: the server preloads zkeys
 *     keyed by filename stem (fullprover.cpp:21-63 behaviour), so
 *     groth16_prover_create_zkey_file("/path/circ.zkey") targets the
 *     server's "circ" slot.  zkey *buffers* cannot be mapped to a slot
 *     and return PROVER_ERROR with a pointed message.
 *   - server address: ULTRAGROTH_SERVER env (default 127.0.0.1:9080),
 *     plain HTTP/1.1 over POSIX sockets (no TLS: terminate TLS in front
 *     of the service; phones talk to it like any other API endpoint).
 *   - prove = POST /input/<circuit> (application/octet-stream witness)
 *     then poll GET /status until the state machine leaves "busy"
 *     (tools/request.js:7-44 contract).
 *
 * No external dependencies: plain C99 + BSD sockets, so the same file
 * cross-compiles with the Android NDK and Xcode toolchains
 * (scripts/build_android_system.sh, scripts/create_xcframework.sh).
 */
#define _POSIX_C_SOURCE 200809L
#include <errno.h>
#include <netdb.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#define PROVER_OK 0x0
#define PROVER_ERROR 0x1
#define PROVER_ERROR_SHORT_BUFFER 0x2
#define PROVER_INVALID_WITNESS_LENGTH 0x3

#define MAX_BODY (16u << 20)

typedef struct {
    char host[256];
    char port[16];
    char circuit[256];
} remote_prover;

static void set_err(char *err, unsigned long long maxsize, const char *msg) {
    if (err && maxsize) {
        strncpy(err, msg, maxsize - 1);
        err[maxsize - 1] = '\0';
    }
}

static int parse_server_env(remote_prover *rp, char *err,
                            unsigned long long errsz) {
    const char *srv = getenv("ULTRAGROTH_SERVER");
    if (!srv || !*srv) srv = "127.0.0.1:9080";
    const char *p = strstr(srv, "://");
    if (p) srv = p + 3;                      /* tolerate http:// prefix */
    const char *colon = strrchr(srv, ':');
    size_t hlen = colon ? (size_t)(colon - srv) : strlen(srv);
    if (hlen == 0 || hlen >= sizeof rp->host) {
        set_err(err, errsz, "ULTRAGROTH_SERVER: bad host");
        return PROVER_ERROR;
    }
    memcpy(rp->host, srv, hlen);
    rp->host[hlen] = '\0';
    snprintf(rp->port, sizeof rp->port, "%s", colon ? colon + 1 : "9080");
    return PROVER_OK;
}

static int http_connect(const remote_prover *rp, char *err,
                        unsigned long long errsz) {
    struct addrinfo hints, *res = NULL, *ai;
    memset(&hints, 0, sizeof hints);
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(rp->host, rp->port, &hints, &res) != 0) {
        set_err(err, errsz, "proof server: cannot resolve host");
        return -1;
    }
    int fd = -1;
    for (ai = res; ai; ai = ai->ai_next) {
        fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
        if (fd < 0) continue;
        if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    if (fd < 0) set_err(err, errsz, "proof server: connection refused");
    return fd;
}

static int send_all(int fd, const void *buf, size_t n) {
    const char *p = (const char *)buf;
    while (n) {
        ssize_t w = write(fd, p, n);
        if (w <= 0) {
            if (w < 0 && errno == EINTR) continue;
            return -1;
        }
        p += w;
        n -= (size_t)w;
    }
    return 0;
}

/* One HTTP request; returns malloc'd body (NUL-terminated), NULL on
 * failure.  Minimal parser: Content-Length or read-to-close. */
static char *http_request(const remote_prover *rp, const char *method,
                          const char *path, const void *body, size_t body_len,
                          const char *content_type, int *status_out,
                          char *err, unsigned long long errsz) {
    int fd = http_connect(rp, err, errsz);
    if (fd < 0) return NULL;
    char head[1024];
    int hn = snprintf(head, sizeof head,
                      "%s %s HTTP/1.1\r\nHost: %s:%s\r\n"
                      "Content-Type: %s\r\nContent-Length: %zu\r\n"
                      "Connection: close\r\n\r\n",
                      method, path, rp->host, rp->port,
                      content_type ? content_type : "application/json",
                      body_len);
    if (hn < 0 || hn >= (int)sizeof head || send_all(fd, head, (size_t)hn) ||
        (body_len && send_all(fd, body, body_len))) {
        set_err(err, errsz, "proof server: send failed");
        close(fd);
        return NULL;
    }
    size_t cap = 1 << 16, n = 0;
    char *resp = (char *)malloc(cap);
    if (!resp) {
        close(fd);
        return NULL;
    }
    for (;;) {
        if (n + 4096 + 1 > cap) {
            if (cap >= MAX_BODY) break;
            cap *= 2;
            char *nr = (char *)realloc(resp, cap);
            if (!nr) break;
            resp = nr;
        }
        ssize_t r = read(fd, resp + n, 4096);
        if (r < 0 && errno == EINTR) continue;
        if (r <= 0) break;
        n += (size_t)r;
    }
    close(fd);
    resp[n] = '\0';
    int status = 0;
    if (sscanf(resp, "HTTP/%*s %d", &status) != 1) {
        set_err(err, errsz, "proof server: bad HTTP response");
        free(resp);
        return NULL;
    }
    if (status_out) *status_out = status;
    char *body_p = strstr(resp, "\r\n\r\n");
    if (!body_p) {
        set_err(err, errsz, "proof server: truncated response");
        free(resp);
        return NULL;
    }
    body_p += 4;
    char *out = strdup(body_p);
    free(resp);
    return out;
}

/* Tiny JSON string-field extractor (server emits flat JSON; values are
 * JSON-escaped strings or objects).  Returns malloc'd UNESCAPED string
 * for string values, or the raw object slice for object values. */
static char *json_field(const char *json, const char *key) {
    char pat[128];
    snprintf(pat, sizeof pat, "\"%s\":", key);
    const char *p = strstr(json, pat);
    if (!p) {
        snprintf(pat, sizeof pat, "\"%s\" :", key);
        p = strstr(json, pat);
        if (!p) return NULL;
    }
    p += strlen(pat);
    while (*p == ' ') p++;
    if (*p == '"') {                       /* string value: unescape */
        p++;
        size_t cap = strlen(p) + 1;
        char *out = (char *)malloc(cap), *o = out;
        if (!out) return NULL;
        while (*p && *p != '"') {
            if (*p == '\\' && p[1]) {
                p++;
                switch (*p) {
                case 'n': *o++ = '\n'; break;
                case 't': *o++ = '\t'; break;
                case 'r': *o++ = '\r'; break;
                default: *o++ = *p; break;
                }
                p++;
            } else {
                *o++ = *p++;
            }
        }
        *o = '\0';
        return out;
    }
    if (*p == '{' || *p == '[') {          /* object value: slice it */
        char open = *p, closec = (open == '{') ? '}' : ']';
        int depth = 0;
        const char *q = p;
        int instr = 0;
        for (; *q; q++) {
            if (instr) {
                if (*q == '\\' && q[1]) q++;
                else if (*q == '"') instr = 0;
            } else if (*q == '"') instr = 1;
            else if (*q == open) depth++;
            else if (*q == closec && --depth == 0) { q++; break; }
        }
        size_t len = (size_t)(q - p);
        char *out = (char *)malloc(len + 1);
        if (!out) return NULL;
        memcpy(out, p, len);
        out[len] = '\0';
        return out;
    }
    return NULL;
}

static int copy_out(const char *val, char *buf, unsigned long long *size,
                    char *err, unsigned long long errsz, const char *what) {
    unsigned long long need = (unsigned long long)strlen(val) + 1;
    if (!buf || !size || *size < need) {
        if (size) *size = need;
        set_err(err, errsz, what);
        return PROVER_ERROR_SHORT_BUFFER;
    }
    memcpy(buf, val, need);
    *size = need;
    return PROVER_OK;
}

static const char *stem(const char *path) {
    const char *s = strrchr(path, '/');
    return s ? s + 1 : path;
}

static int make_prover(void **obj, const char *zkey_path, char *err,
                       unsigned long long errsz) {
    remote_prover *rp = (remote_prover *)calloc(1, sizeof *rp);
    if (!rp) {
        set_err(err, errsz, "out of memory");
        return PROVER_ERROR;
    }
    if (parse_server_env(rp, err, errsz) != PROVER_OK) {
        free(rp);
        return PROVER_ERROR;
    }
    const char *base = stem(zkey_path);
    const char *dot = strrchr(base, '.');
    size_t len = dot ? (size_t)(dot - base) : strlen(base);
    if (len == 0 || len >= sizeof rp->circuit) {
        set_err(err, errsz, "zkey path has no usable circuit stem");
        free(rp);
        return PROVER_ERROR;
    }
    memcpy(rp->circuit, base, len);
    rp->circuit[len] = '\0';
    /* liveness probe: /status must answer (server preloads the zkeys;
     * there is nothing to upload from here) */
    int status = 0;
    char *body = http_request(rp, "GET", "/status", NULL, 0, NULL, &status,
                              err, errsz);
    if (!body) {
        free(rp);
        return PROVER_ERROR;
    }
    free(body);
    *obj = rp;
    return PROVER_OK;
}

static int remote_prove(void *obj, const void *wtns, unsigned long long wn,
                        char *proof, unsigned long long *proof_size,
                        char *pub, unsigned long long *public_size,
                        char *err, unsigned long long errsz) {
    remote_prover *rp = (remote_prover *)obj;
    if (!rp || !wtns) {
        set_err(err, errsz, "null prover/witness");
        return PROVER_ERROR;
    }
    char path[512];
    snprintf(path, sizeof path, "/input/%s", rp->circuit);
    int status = 0;
    char *body = http_request(rp, "POST", path, wtns, (size_t)wn,
                              "application/octet-stream", &status, err, errsz);
    if (!body) return PROVER_ERROR;
    if (status != 200) {
        char *msg = json_field(body, "error");
        set_err(err, errsz, msg ? msg : body);
        free(msg);
        free(body);
        return PROVER_ERROR;
    }
    free(body);
    /* poll /status until the prover leaves busy (reference client
     * behaviour, tools/request.js:36-44) */
    for (int i = 0; i < 6000; i++) {       /* ~10 min cap at 100 ms */
        body = http_request(rp, "GET", "/status", NULL, 0, NULL, &status,
                            err, errsz);
        if (!body) return PROVER_ERROR;
        char *st = json_field(body, "status");
        if (!st) {
            set_err(err, errsz, "proof server: /status has no status");
            free(body);
            return PROVER_ERROR;
        }
        if (strcmp(st, "busy") != 0 && strcmp(st, "ready") != 0) {
            int rc;
            if (strcmp(st, "success") == 0) {
                char *pj = json_field(body, "proof");
                char *uj = json_field(body, "pubData");
                if (!pj || !uj) {
                    set_err(err, errsz, "proof server: success w/o proof");
                    rc = PROVER_ERROR;
                } else {
                    rc = copy_out(pj, proof, proof_size, err, errsz,
                                  "short proof buffer");
                    if (rc == PROVER_OK)
                        rc = copy_out(uj, pub, public_size, err, errsz,
                                      "short public buffer");
                }
                free(pj);
                free(uj);
            } else {                       /* failed / aborted */
                char *msg = json_field(body, "error");
                set_err(err, errsz, msg ? msg : st);
                free(msg);
                rc = PROVER_ERROR;
            }
            free(st);
            free(body);
            return rc;
        }
        free(st);
        free(body);
        struct timespec ts = {0, 100 * 1000 * 1000};
        nanosleep(&ts, NULL);
    }
    set_err(err, errsz, "proof server: prove timed out");
    return PROVER_ERROR;
}

/* -- public ABI (prover.h) ------------------------------------------------ */

void groth16_proof_size(unsigned long long *proof_size) {
    if (proof_size) *proof_size = 1536; /* reference parity constant */
}
void ultra_groth_proof_size(unsigned long long *proof_size) {
    if (proof_size) *proof_size = 2048;
}

int groth16_prover_create_zkey_file(void **prover_object,
                                    const char *zkey_file_path,
                                    char *error_msg,
                                    unsigned long long error_msg_maxsize) {
    return make_prover(prover_object, zkey_file_path, error_msg,
                       error_msg_maxsize);
}
int ultra_groth_prover_create_zkey_file(void **prover_object,
                                        const char *zkey_file_path,
                                        char *error_msg,
                                        unsigned long long error_msg_maxsize) {
    return make_prover(prover_object, zkey_file_path, error_msg,
                       error_msg_maxsize);
}

int groth16_prover_create(void **prover_object, const void *zkey_buffer,
                          unsigned long long zkey_size, char *error_msg,
                          unsigned long long error_msg_maxsize) {
    (void)prover_object;
    (void)zkey_buffer;
    (void)zkey_size;
    set_err(error_msg, error_msg_maxsize,
            "remote prover selects circuits by zkey FILENAME stem; use "
            "groth16_prover_create_zkey_file (the server preloads zkeys)");
    return PROVER_ERROR;
}
int ultra_groth_prover_create(void **prover_object, const void *zkey_buffer,
                              unsigned long long zkey_size, char *error_msg,
                              unsigned long long error_msg_maxsize) {
    return groth16_prover_create(prover_object, zkey_buffer, zkey_size,
                                 error_msg, error_msg_maxsize);
}

int groth16_prover_prove(void *prover_object, const void *wtns_buffer,
                         unsigned long long wtns_size, char *proof_buffer,
                         unsigned long long *proof_size, char *public_buffer,
                         unsigned long long *public_size, char *error_msg,
                         unsigned long long error_msg_maxsize) {
    return remote_prove(prover_object, wtns_buffer, wtns_size, proof_buffer,
                        proof_size, public_buffer, public_size, error_msg,
                        error_msg_maxsize);
}
int ultra_groth_prover_prove(void *prover_object, const void *wtns_buffer,
                             unsigned long long wtns_size, char *proof_buffer,
                             unsigned long long *proof_size,
                             char *public_buffer,
                             unsigned long long *public_size, char *error_msg,
                             unsigned long long error_msg_maxsize) {
    return remote_prove(prover_object, wtns_buffer, wtns_size, proof_buffer,
                        proof_size, public_buffer, public_size, error_msg,
                        error_msg_maxsize);
}

void groth16_prover_destroy(void *prover_object) { free(prover_object); }
void ultra_groth_prover_destroy(void *prover_object) { free(prover_object); }

int groth16_prover_zkey_file(const char *zkey_file_path,
                             const void *wtns_buffer,
                             unsigned long long wtns_size, char *proof_buffer,
                             unsigned long long *proof_size,
                             char *public_buffer,
                             unsigned long long *public_size, char *error_msg,
                             unsigned long long error_msg_maxsize) {
    void *obj = NULL;
    int rc = groth16_prover_create_zkey_file(&obj, zkey_file_path, error_msg,
                                             error_msg_maxsize);
    if (rc != PROVER_OK) return rc;
    rc = groth16_prover_prove(obj, wtns_buffer, wtns_size, proof_buffer,
                              proof_size, public_buffer, public_size,
                              error_msg, error_msg_maxsize);
    groth16_prover_destroy(obj);
    return rc;
}
int ultra_groth_prover_zkey_file(
    const char *zkey_file_path, const void *wtns_buffer,
    unsigned long long wtns_size, char *proof_buffer,
    unsigned long long *proof_size, char *public_buffer,
    unsigned long long *public_size, char *error_msg,
    unsigned long long error_msg_maxsize) {
    void *obj = NULL;
    int rc = ultra_groth_prover_create_zkey_file(&obj, zkey_file_path,
                                                 error_msg,
                                                 error_msg_maxsize);
    if (rc != PROVER_OK) return rc;
    rc = ultra_groth_prover_prove(obj, wtns_buffer, wtns_size, proof_buffer,
                                  proof_size, public_buffer, public_size,
                                  error_msg, error_msg_maxsize);
    ultra_groth_prover_destroy(obj);
    return rc;
}
