// Single-process MPI shim for measuring the reference framework's
// single-node CPU baseline without an MPI installation (only runtime libs
// are present in this image, no headers). Implements exactly the subset the
// reference uses (see SURVEY.md §2.3): world size 1, rank 0; collectives
// are memcpys; point-to-point is an in-process loopback queue (the
// reference's comm engine sends to itself through dedicated threads even in
// single-partition runs).
//
// This is OUR code (tools/), not part of the framework proper.
#ifndef NSL_FAKE_MPI_H
#define NSL_FAKE_MPI_H

#include <cstddef>

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;

#define MPI_COMM_WORLD 0

#define MPI_CHAR 1
#define MPI_UNSIGNED_CHAR 2
#define MPI_INT 3
#define MPI_UNSIGNED 4
#define MPI_LONG 5
#define MPI_UNSIGNED_LONG 6
#define MPI_FLOAT 7
#define MPI_DOUBLE 8

#define MPI_SUM 1
#define MPI_MAX 2
#define MPI_MIN 3

#define MPI_THREAD_SINGLE 0
#define MPI_THREAD_FUNNELED 1
#define MPI_THREAD_SERIALIZED 2
#define MPI_THREAD_MULTIPLE 3

#define MPI_ANY_SOURCE (-1)
#define MPI_ANY_TAG (-1)

#define MPI_IN_PLACE ((void *)1)

typedef struct MPI_Status {
  int MPI_SOURCE;
  int MPI_TAG;
  int _count_bytes;
} MPI_Status;

#define MPI_STATUS_IGNORE ((MPI_Status *)0)

#define MPI_SUCCESS 0

int MPI_Init_thread(int *argc, char ***argv, int required, int *provided);
int MPI_Finalize(void);
int MPI_Comm_rank(MPI_Comm comm, int *rank);
int MPI_Comm_size(MPI_Comm comm, int *size);
int MPI_Barrier(MPI_Comm comm);
double MPI_Wtime(void);
int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
                  MPI_Datatype dt, MPI_Op op, MPI_Comm comm);
int MPI_Bcast(void *buffer, int count, MPI_Datatype dt, int root,
              MPI_Comm comm);
int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest, int tag,
             MPI_Comm comm);
int MPI_Recv(void *buf, int count, MPI_Datatype dt, int source, int tag,
             MPI_Comm comm, MPI_Status *status);
int MPI_Probe(int source, int tag, MPI_Comm comm, MPI_Status *status);
int MPI_Get_count(const MPI_Status *status, MPI_Datatype dt, int *count);

#ifdef __cplusplus
}
#endif

#endif  // NSL_FAKE_MPI_H
