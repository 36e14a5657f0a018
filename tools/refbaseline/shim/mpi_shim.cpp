// Implementation of the single-process MPI shim (see mpi.h).
#include "mpi.h"

#include <chrono>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

int dt_size(MPI_Datatype dt) {
  switch (dt) {
    case MPI_CHAR:
    case MPI_UNSIGNED_CHAR:
      return 1;
    case MPI_INT:
    case MPI_UNSIGNED:
    case MPI_FLOAT:
      return 4;
    case MPI_LONG:
    case MPI_UNSIGNED_LONG:
    case MPI_DOUBLE:
      return 8;
  }
  return 1;
}

struct Message {
  int tag;
  std::vector<char> data;
};

std::mutex g_mu;
std::condition_variable g_cv;
std::deque<Message> g_queue;

bool tag_matches(int want, int have) {
  return want == MPI_ANY_TAG || want == have;
}

}  // namespace

extern "C" {

int MPI_Init_thread(int *, char ***, int required, int *provided) {
  if (provided) *provided = required;
  return MPI_SUCCESS;
}
int MPI_Finalize(void) { return MPI_SUCCESS; }
int MPI_Comm_rank(MPI_Comm, int *rank) {
  *rank = 0;
  return MPI_SUCCESS;
}
int MPI_Comm_size(MPI_Comm, int *size) {
  *size = 1;
  return MPI_SUCCESS;
}
int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }

double MPI_Wtime(void) {
  auto now = std::chrono::steady_clock::now().time_since_epoch();
  return std::chrono::duration<double>(now).count();
}

int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
                  MPI_Datatype dt, MPI_Op, MPI_Comm) {
  if (sendbuf != MPI_IN_PLACE && sendbuf != recvbuf)
    std::memcpy(recvbuf, sendbuf, (size_t)count * dt_size(dt));
  return MPI_SUCCESS;
}

int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) { return MPI_SUCCESS; }

int MPI_Send(const void *buf, int count, MPI_Datatype dt, int, int tag,
             MPI_Comm) {
  Message m;
  m.tag = tag;
  m.data.assign((const char *)buf,
                (const char *)buf + (size_t)count * dt_size(dt));
  {
    std::lock_guard<std::mutex> lk(g_mu);
    g_queue.push_back(std::move(m));
  }
  g_cv.notify_all();
  return MPI_SUCCESS;
}

int MPI_Probe(int, int tag, MPI_Comm, MPI_Status *status) {
  std::unique_lock<std::mutex> lk(g_mu);
  g_cv.wait(lk, [&] {
    for (auto &m : g_queue)
      if (tag_matches(tag, m.tag)) return true;
    return false;
  });
  for (auto &m : g_queue) {
    if (tag_matches(tag, m.tag)) {
      if (status) {
        status->MPI_SOURCE = 0;
        status->MPI_TAG = m.tag;
        status->_count_bytes = (int)m.data.size();
      }
      return MPI_SUCCESS;
    }
  }
  return MPI_SUCCESS;
}

int MPI_Get_count(const MPI_Status *status, MPI_Datatype dt, int *count) {
  *count = status ? status->_count_bytes / dt_size(dt) : 0;
  return MPI_SUCCESS;
}

int MPI_Recv(void *buf, int count, MPI_Datatype dt, int, int tag, MPI_Comm,
             MPI_Status *status) {
  std::unique_lock<std::mutex> lk(g_mu);
  g_cv.wait(lk, [&] {
    for (auto &m : g_queue)
      if (tag_matches(tag, m.tag)) return true;
    return false;
  });
  for (auto it = g_queue.begin(); it != g_queue.end(); ++it) {
    if (tag_matches(tag, it->tag)) {
      size_t want = (size_t)count * dt_size(dt);
      size_t have = it->data.size();
      std::memcpy(buf, it->data.data(), have < want ? have : want);
      if (status) {
        status->MPI_SOURCE = 0;
        status->MPI_TAG = it->tag;
        status->_count_bytes = (int)have;
      }
      g_queue.erase(it);
      return MPI_SUCCESS;
    }
  }
  return MPI_SUCCESS;
}

}  // extern "C"
