package pp;

import java.nio.charset.StandardCharsets;
import java.util.HashMap;
import java.util.Map;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.parquet.crypto.ColumnEncryptionProperties;
import org.apache.parquet.crypto.EncryptionPropertiesFactory;
import org.apache.parquet.crypto.FileEncryptionProperties;
import org.apache.parquet.crypto.ParquetCipher;
import org.apache.parquet.hadoop.api.WriteSupport;
import org.apache.parquet.hadoop.metadata.ColumnPath;

/**
 * Parquet Modular Encryption WRITE hook, completing the corpus's
 * encryption envelope (reference README.md:37-50 publishes only files
 * + keys; the read side is PlaygroundDecryptionFactory). Uses the same
 * published key ids: footer "kf", column keys "kc1"/"kc2", so files
 * written here are readable with the exact corpus key retriever.
 *
 * Activated per-write via the standard SPI conf
 * parquet.crypto.factory.class; knobs (all per-write Hadoop confs):
 *   playground.encrypt.columns  "col:keyId,col:keyId" column keys
 *   playground.plaintext.footer "true" for the plaintext-footer mode
 *   playground.aad.prefix       AAD prefix string (stored in-file)
 *
 * Extends the decryption factory so one class serves a full
 * write-then-read roundtrip under a single factory conf.
 */
public class PlaygroundCryptoFactory extends PlaygroundDecryptionFactory
    implements EncryptionPropertiesFactory {

  @Override
  public FileEncryptionProperties getFileEncryptionProperties(
      Configuration conf, Path tempFilePath, WriteSupport.WriteContext fileWriteContext) {
    String colSpec = conf.get("playground.encrypt.columns", "");
    Map<ColumnPath, ColumnEncryptionProperties> colProps = new HashMap<>();
    for (String pair : colSpec.split(",")) {
      if (pair.isEmpty()) {
        continue;
      }
      String[] kv = pair.split(":");
      ColumnEncryptionProperties cep =
          ColumnEncryptionProperties.builder(kv[0])
              .withKey(PlaygroundDecryptionFactory.keyFor(kv[1]))
              .withKeyID(kv[1])
              .build();
      colProps.put(ColumnPath.fromDotString(kv[0]), cep);
    }
    FileEncryptionProperties.Builder builder =
        FileEncryptionProperties.builder(PlaygroundDecryptionFactory.keyFor("kf"))
            .withFooterKeyID("kf");
    if (!colProps.isEmpty()) {
      builder.withEncryptedColumns(colProps);
    }
    if (conf.getBoolean("playground.plaintext.footer", false)) {
      builder.withPlaintextFooter();
    }
    if ("GCM_CTR".equals(conf.get("playground.cipher"))) {
      builder.withAlgorithm(ParquetCipher.AES_GCM_CTR_V1);
    }
    String aadPrefix = conf.get("playground.aad.prefix");
    if (aadPrefix != null) {
      builder.withAADPrefix(aadPrefix.getBytes(StandardCharsets.UTF_8));
      if (conf.getBoolean("playground.disable.aad.storage", false)) {
        builder.withoutAADPrefixStorage();
      }
    }
    return builder.build();
  }
}
