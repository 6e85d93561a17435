import java.util.concurrent.CountDownLatch;
import java.util.concurrent.ExecutorService;
import java.util.concurrent.Executors;

/**
 * STREAM-triad-style aggregate memory-bandwidth probe: the hardware
 * denominator for the N-vs-4N scaling-efficiency analysis in BASELINE.md.
 *
 * Each thread owns three private long arrays far beyond LLC size and
 * repeatedly runs a[i] = b[i] + 3*c[i]; the best-of-reps aggregate GB/s
 * (16 B read + 8 B write per element) is reported. Run at the same thread
 * counts as the scaling legs (tools/membw/membw.sh does 1..32) to measure
 * how much memory bandwidth the HOST can add from N to 4N threads — on a
 * single-socket box this saturates near the core count where the memory
 * controllers run out, and no memory-traffic-bound job can out-scale it.
 *
 * Usage: java MemBw <threads> [perThreadMB=256] [reps=5]
 */
public class MemBw {
  public static void main(String[] args) throws Exception {
    int threads = Integer.parseInt(args[0]);
    int perThreadMB = args.length > 1 ? Integer.parseInt(args[1]) : 256;
    int reps = args.length > 2 ? Integer.parseInt(args[2]) : 5;
    int n = perThreadMB * 1024 * 1024 / 8 / 3; // three arrays per thread
    ExecutorService pool = Executors.newFixedThreadPool(threads);
    long[][][] arrs = new long[threads][][];
    for (int t = 0; t < threads; t++)
      arrs[t] = new long[][]{ new long[n], new long[n], new long[n] };
    runPass(pool, threads, arrs); // warmup + page touch
    long best = Long.MAX_VALUE;
    for (int r = 0; r < reps; r++) {
      long t0 = System.nanoTime();
      runPass(pool, threads, arrs);
      best = Math.min(best, System.nanoTime() - t0);
    }
    double bytes = 3.0 * 8 * n * threads; // read b,c + write a
    System.out.printf("threads=%d triad_GBps=%.2f%n", threads, bytes / best);
    pool.shutdown();
  }

  static void runPass(ExecutorService pool, int threads, long[][][] arrs)
      throws Exception {
    CountDownLatch done = new CountDownLatch(threads);
    for (int t = 0; t < threads; t++) {
      final long[][] a = arrs[t];
      pool.execute(() -> {
        long[] x = a[0], b = a[1], c = a[2];
        for (int i = 0; i < x.length; i++) x[i] = b[i] + 3 * c[i];
        done.countDown();
      });
    }
    done.await();
  }
}
