/* Single-rank MPI stub implementation (see mpi.h). */
#include "mpi.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#define DIE(msg)                                                   \
  do {                                                             \
    fprintf(stderr, "mpistub: %s\n", msg);                         \
    exit(99);                                                      \
  } while (0)

int MPI_Init(int *argc, char ***argv) {
  (void)argc;
  (void)argv;
  return MPI_SUCCESS;
}
int MPI_Finalize(void) { return MPI_SUCCESS; }
int MPI_Abort(MPI_Comm comm, int errorcode) {
  (void)comm;
  fprintf(stderr, "mpistub: MPI_Abort(%d)\n", errorcode);
  exit(errorcode ? errorcode : 1);
}
int MPI_Comm_size(MPI_Comm comm, int *size) {
  (void)comm;
  *size = 1;
  return MPI_SUCCESS;
}
int MPI_Comm_rank(MPI_Comm comm, int *rank) {
  (void)comm;
  *rank = 0;
  return MPI_SUCCESS;
}
int MPI_Barrier(MPI_Comm comm) {
  (void)comm;
  return MPI_SUCCESS;
}
double MPI_Wtime(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

int MPI_Bcast(void *buffer, int count, MPI_Datatype datatype, int root,
              MPI_Comm comm) {
  (void)buffer;
  (void)count;
  (void)datatype;
  (void)root;
  (void)comm;
  return MPI_SUCCESS;
}

int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
                  MPI_Datatype datatype, MPI_Op op, MPI_Comm comm) {
  (void)op;
  (void)comm;
  if (sendbuf != MPI_IN_PLACE)
    memcpy(recvbuf, sendbuf, (size_t)count * (size_t)datatype);
  return MPI_SUCCESS;
}
int MPI_Reduce(const void *sendbuf, void *recvbuf, int count,
               MPI_Datatype datatype, MPI_Op op, int root, MPI_Comm comm) {
  (void)root;
  return MPI_Allreduce(sendbuf, recvbuf, count, datatype, op, comm);
}
int MPI_Allgather(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                  void *recvbuf, int recvcount, MPI_Datatype recvtype,
                  MPI_Comm comm) {
  (void)recvcount;
  (void)recvtype;
  (void)comm;
  if (sendbuf != MPI_IN_PLACE)
    memcpy(recvbuf, sendbuf, (size_t)sendcount * (size_t)sendtype);
  return MPI_SUCCESS;
}
int MPI_Alltoall(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                 void *recvbuf, int recvcount, MPI_Datatype recvtype,
                 MPI_Comm comm) {
  return MPI_Allgather(sendbuf, sendcount, sendtype, recvbuf, recvcount,
                       recvtype, comm);
}
int MPI_Alltoallv(const void *sendbuf, const int *sendcounts,
                  const int *sdispls, MPI_Datatype sendtype, void *recvbuf,
                  const int *recvcounts, const int *rdispls,
                  MPI_Datatype recvtype, MPI_Comm comm) {
  (void)recvcounts;
  (void)comm;
  memcpy((char *)recvbuf + (size_t)rdispls[0] * (size_t)recvtype,
         (const char *)sendbuf + (size_t)sdispls[0] * (size_t)sendtype,
         (size_t)sendcounts[0] * (size_t)sendtype);
  return MPI_SUCCESS;
}

/* ---- self message queue (rank 0 -> rank 0 only) ---- */
typedef struct {
  const void *sendbuf; /* pending send */
  void *recvbuf;       /* pending recv */
  size_t bytes;
  int tag;
  int live;
  int is_recv;
} Msg;

#define MAXMSG 1024
static Msg q[MAXMSG];

static int q_push(const void *sbuf, void *rbuf, size_t bytes, int tag,
                  int is_recv) {
  for (int i = 0; i < MAXMSG; ++i)
    if (!q[i].live) {
      q[i].sendbuf = sbuf;
      q[i].recvbuf = rbuf;
      q[i].bytes = bytes;
      q[i].tag = tag;
      q[i].live = 1;
      q[i].is_recv = is_recv;
      return i;
    }
  DIE("message queue full");
}

static int q_match(int tag, int want_recv) {
  for (int i = 0; i < MAXMSG; ++i)
    if (q[i].live && q[i].is_recv == want_recv &&
        (q[i].tag == tag || tag == MPI_ANY_TAG || q[i].tag == MPI_ANY_TAG))
      return i;
  return -1;
}

static void fill_status(MPI_Status *status, int tag, size_t bytes) {
  if (status) {
    status->MPI_SOURCE = 0;
    status->MPI_TAG = tag;
    status->MPI_ERROR = MPI_SUCCESS;
    status->_count_bytes = (int)bytes;
  }
}

int MPI_Send(const void *buf, int count, MPI_Datatype datatype, int dest,
             int tag, MPI_Comm comm) {
  (void)comm;
  if (dest != 0) DIE("send to nonzero rank");
  size_t bytes = (size_t)count * (size_t)datatype;
  int i = q_match(tag, 1);
  if (i >= 0) { /* a recv is waiting */
    if (bytes > q[i].bytes) DIE("send larger than posted recv");
    memcpy(q[i].recvbuf, buf, bytes);
    q[i].bytes = bytes; /* actual transferred size for Get_count */
    q[i].is_recv = 2;   /* completed */
    return MPI_SUCCESS;
  }
  /* buffer the send: the reference always posts the matching recv in the
   * same iteration, so keeping the caller's pointer is safe */
  q_push(buf, NULL, bytes, tag, 0);
  return MPI_SUCCESS;
}
int MPI_Ssend(const void *buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm) {
  return MPI_Send(buf, count, datatype, dest, tag, comm);
}
int MPI_Recv(void *buf, int count, MPI_Datatype datatype, int source, int tag,
             MPI_Comm comm, MPI_Status *status) {
  (void)comm;
  if (source != 0 && source != MPI_ANY_SOURCE) DIE("recv from nonzero rank");
  int i = q_match(tag, 0);
  if (i < 0) DIE("blocking recv with no matching self send");
  size_t bytes = (size_t)count * (size_t)datatype;
  if (q[i].bytes > bytes) DIE("recv smaller than pending send");
  memcpy(buf, q[i].sendbuf, q[i].bytes);
  fill_status(status, q[i].tag, q[i].bytes);
  q[i].live = 0;
  return MPI_SUCCESS;
}
int MPI_Sendrecv(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
                 int dest, int sendtag, void *recvbuf, int recvcount,
                 MPI_Datatype recvtype, int source, int recvtag, MPI_Comm comm,
                 MPI_Status *status) {
  (void)dest;
  (void)source;
  (void)comm;
  (void)sendtag;
  size_t sbytes = (size_t)sendcount * (size_t)sendtype;
  size_t rbytes = (size_t)recvcount * (size_t)recvtype;
  size_t bytes = sbytes < rbytes ? sbytes : rbytes;
  memmove(recvbuf, sendbuf, bytes);
  fill_status(status, recvtag, sbytes);
  return MPI_SUCCESS;
}

int MPI_Isend(const void *buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm, MPI_Request *request) {
  (void)comm;
  if (dest != 0) DIE("isend to nonzero rank");
  size_t bytes = (size_t)count * (size_t)datatype;
  int i = q_match(tag, 1);
  if (i >= 0) {
    if (bytes > q[i].bytes) DIE("isend larger than posted recv");
    memcpy(q[i].recvbuf, buf, bytes);
    q[i].bytes = bytes;
    q[i].is_recv = 2;
    *request = -1; /* already complete */
    return MPI_SUCCESS;
  }
  *request = q_push(buf, NULL, bytes, tag, 0);
  return MPI_SUCCESS;
}
int MPI_Issend(const void *buf, int count, MPI_Datatype datatype, int dest,
               int tag, MPI_Comm comm, MPI_Request *request) {
  return MPI_Isend(buf, count, datatype, dest, tag, comm, request);
}
int MPI_Irecv(void *buf, int count, MPI_Datatype datatype, int source, int tag,
              MPI_Comm comm, MPI_Request *request) {
  (void)comm;
  if (source != 0 && source != MPI_ANY_SOURCE) DIE("irecv from nonzero rank");
  size_t bytes = (size_t)count * (size_t)datatype;
  int i = q_match(tag, 0); /* pending send? */
  if (i >= 0) {
    if (q[i].bytes > bytes) DIE("irecv smaller than pending send");
    memcpy(buf, q[i].sendbuf, q[i].bytes);
    q[i].live = 0;
    *request = -1;
    return MPI_SUCCESS;
  }
  *request = q_push(NULL, buf, bytes, tag, 1);
  return MPI_SUCCESS;
}
int MPI_Wait(MPI_Request *request, MPI_Status *status) {
  int r = *request;
  if (r < 0) { /* already complete */
    fill_status(status, 0, 0);
    return MPI_SUCCESS;
  }
  if (!q[r].live) DIE("wait on dead request");
  if (q[r].is_recv == 2) { /* completed recv */
    fill_status(status, q[r].tag, q[r].bytes);
    q[r].live = 0;
  } else if (q[r].is_recv == 1) {
    DIE("wait on unmatched recv (no self send arrived)");
  } else {
    /* pending send: with one rank the matching irecv must already have
     * drained it, so a live send at Wait means it was matched & freed or
     * the pattern is unsupported; treat live as unmatched */
    DIE("wait on unmatched send");
  }
  *request = -1;
  return MPI_SUCCESS;
}
int MPI_Get_count(const MPI_Status *status, MPI_Datatype datatype,
                  int *count) {
  *count = status ? status->_count_bytes / (int)datatype : 0;
  return MPI_SUCCESS;
}

int MPI_Comm_group(MPI_Comm comm, MPI_Group *group) {
  (void)comm;
  *group = 0;
  return MPI_SUCCESS;
}
int MPI_Group_incl(MPI_Group group, int n, const int ranks[],
                   MPI_Group *newgroup) {
  (void)group;
  (void)n;
  (void)ranks;
  *newgroup = 0;
  return MPI_SUCCESS;
}
int MPI_Comm_create(MPI_Comm comm, MPI_Group group, MPI_Comm *newcomm) {
  (void)comm;
  (void)group;
  *newcomm = 0;
  return MPI_SUCCESS;
}
int MPI_Group_free(MPI_Group *group) {
  *group = MPI_GROUP_NULL;
  return MPI_SUCCESS;
}
int MPI_Comm_free(MPI_Comm *comm) {
  *comm = MPI_COMM_NULL;
  return MPI_SUCCESS;
}
