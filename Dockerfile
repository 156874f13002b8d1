# Container packaging for the deployable runtime (graft.Serve) —
# the repo's analogue of the reference's Lambda image
# (/root/reference/Dockerfile:1-8: base image → COPY → build → CMD
# entry). Same four-beat shape, Spark-shaped runtime: a builder
# stage assembles the jar, the runtime stage is the public Apache
# Spark image and the entry is spark-submit.
#
# NOTE: this sandbox has no docker daemon or registry egress — the
# file is structure-tested (ServePackagingSpec: stage shape, entry
# class, port contract, entrypoint syntax), not built here.

# ---- jar source: the same Spark image the runtime uses ----
# build.sbt resolves Spark as an unmanaged classpath at
# /opt/spark/jars (zero-egress design) — stage the IDENTICAL jars
# into the builder so compile-against == run-against.
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu AS spark

# ---- build stage: sbt on JDK 17 (public image) ----
# tag's sbt matches project/build.properties (1.10.0) so the build
# needs no launcher download; the project's scalaVersion still comes
# from build.sbt (sbt fetches the pinned compiler as a normal dep)
FROM sbtscala/scala-sbt:eclipse-temurin-17.0.11_9_1.10.0_2.13.14 AS build
COPY --from=spark /opt/spark/jars /opt/spark/jars
WORKDIR /src
COPY build.sbt ./
COPY project/build.properties project/
COPY src/main/ src/main/
RUN sbt -batch package

# ---- runtime stage: public Apache Spark base ----
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu
USER root
COPY --from=build /src/target/scala-2.13/*.jar /opt/graft/graft.jar
COPY docker/entrypoint.sh /opt/graft/entrypoint.sh
RUN chmod +x /opt/graft/entrypoint.sh \
    && mkdir -p /data/spool /data/checkpoint /data/submit /data/state \
    && chown -R spark /data /opt/graft
USER spark

# webhook receiver (graft.Serve prints {"serve":"ready","port":...})
ENV GRAFT_HTTP_PORT=8080 \
    GRAFT_SPOOL_DIR=/data/spool \
    GRAFT_CHECKPOINT_DIR=/data/checkpoint \
    GRAFT_SUBMIT_DIR=/data/submit \
    GRAFT_STATE_DIR=/data/state
EXPOSE 8080

ENTRYPOINT ["/opt/graft/entrypoint.sh"]
